"""WARC ingestion — the Common-Crawl container format.

BASELINE.json frames the input as "Common-Crawl-style web pages"; the
on-the-wire form of Common Crawl is WARC/1.0 (ISO 28500): a stream of
records, each `WARC/1.0\\r\\n` + `Name: value\\r\\n` headers + blank
line + exactly Content-Length payload bytes + `\\r\\n\\r\\n`. This
module turns WARC blobs into the engine's `pages`-shaped rows so a
user can point the crawler/pipeline at real crawl archives instead of
parquet. (The Go reference never reads WARC — it fetches live HTTP,
crawler/crawler_twotier.go:98 — so this is part of the
training-pipeline surface, not reference parity.)

Design:

* **Length-delimited, never regex.** The payload of a web archive
  routinely CONTAINS the bytes ``WARC/1.0`` (pages about WARC, nested
  archives); any delimiter scan mis-splits there. The parser walks
  Content-Length hops exactly, so payload bytes are opaque —
  tests/test_warc.py pins a body with an embedded fake record header.
* **Quarantine, not crash** (the S7 panic-path analogue,
  crawler/crawler.go:137-142): a malformed record yields ONE row with
  ``parse_error`` set and scanning of that blob stops — without
  per-record gzip members (the real-world resync mechanism) there is
  no reliable resync point past a corrupt length.
* **Scale shape**: `spark.read.format("binaryFile")` gives one row
  per archive file; parsing is a single `mapInPandas` pass — blobs
  cross to Python once, records never re-enter the JVM as whole
  blobs, and downstream sees ordinary narrow-ish rows. Partition
  count = file count; Common Crawl ships ~1 GB segment files, so the
  Arrow byte cap in session.py keeps batches to a few blobs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_version", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("parse_error", T.StringType()),
    ]
)


def warc_record_col(
    uri: Column, date_str: Column, body: Column
) -> Column:
    """One WARC/1.0 response record as a string Column —
    Content-Length counts the body's utf-8 OCTETS (the framing the
    parser hops by), not its characters."""
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        uri,
        F.lit("\r\nWARC-Date: "),
        date_str,
        F.lit("\r\nContent-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
        F.lit("\r\n\r\n"),
    )


def _parse_blob(blob_id: str, b: bytes) -> list[dict]:
    rows: list[dict] = []

    def err(idx: int, what: str) -> None:
        rows.append(
            {
                "blob_id": blob_id,
                "record_idx": idx,
                "warc_version": None,
                "warc_type": None,
                "target_uri": None,
                "warc_date": None,
                "content_length": None,
                "body": None,
                "parse_error": what,
            }
        )

    pos, idx = 0, 0
    n = len(b)
    while pos < n:
        while b[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not b.startswith(b"WARC/", pos):
            err(idx, "bad-magic")
            break
        hdr_end = b.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            err(idx, "truncated-headers")
            break
        lines = b[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            err(idx, "bad-content-length")
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            err(idx, "truncated-body")
            break
        rows.append(
            {
                "blob_id": blob_id,
                "record_idx": idx,
                "warc_version": lines[0],
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_length": clen,
                "body": b[body_start : body_start + clen],
                "parse_error": None,
            }
        )
        pos = body_start + clen
        idx += 1
    return rows


def parse_warc(
    df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id"
) -> DataFrame:
    """Parse WARC blobs (binary) into one row per record.

    Input: (id_col string, blob_col binary). Output: PARSED_SCHEMA —
    header fields + exact payload bytes, or a quarantine row
    (``parse_error`` set, rest NULL) where a blob goes bad. One
    mapInPandas pass, no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                out.extend(_parse_blob(bid, bytes(blob)))
            yield pd.DataFrame(
                out, columns=[f.name for f in PARSED_SCHEMA.fields]
            )

    return df.select(
        F.col(id_col).cast("string").alias(id_col), F.col(blob_col)
    ).mapInPandas(op, PARSED_SCHEMA)


def read_warc_dir(
    spark: SparkSession, path: str, glob: str = "*.warc"
) -> DataFrame:
    """Read a directory of WARC files into parsed records: binaryFile
    source (one row per archive, streamed — binaryFile caps at
    spark.sql.files.maxPartitionBytes per task) → :func:`parse_warc`.
    blob_id = the file path, so record lineage survives into the
    frontier's metrics tables."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(F.col("path").alias("blob_id"), F.col("content").alias("blob"))
    )
    return parse_warc(raw)


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) canonical key, the
    ordering CDX archive indexes sort by: scheme and port dropped,
    leading ``www.`` dropped, host lowercased and dot-reversed with
    commas, ``)`` then path (``/`` when empty), query params sorted so
    param-order variants collide — ``https://www.a.b.example:8080/p?z=1&a=2``
    → ``example,b,a)/p?a=2&z=1``. Pure Catalyst (explicit char classes,
    no ``\\s``-class divergence), map-only."""
    host = F.lower(
        F.regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.regexp_replace(host, ":[0-9]+$", "")
    host = F.regexp_replace(host, "^www\\.", "")
    path = F.regexp_extract(
        url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(url, "\\?([^#]*)", 1)
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(q == F.lit(""), F.lit("")).otherwise(
            F.concat(
                F.lit("?"), F.array_join(F.array_sort(F.split(q, "&")), "&")
            )
        ),
    )


def cdx_index(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "body",
) -> DataFrame:
    """CDX-style capture index over an archive: one row per capture
    with its SURT key, payload digest, octet length, and the Wayback
    ``revisit`` flag — a capture whose ``(surt_key, digest)`` was
    already seen at an earlier timestamp is a revisit (stored bodies
    dedup to the original record; this is how web archives avoid
    storing an unchanged page once per crawl).

    Scale shape: everything except the revisit rank is map-only
    Catalyst; the rank is one window over ``(surt_key, digest)`` —
    group size = captures of one unchanged page, bounded by recrawl
    frequency, never corpus-sized, so the single shuffle is skew-free.
    Output sorts by SURT key at write time in a real deployment
    (``sortWithinPartitions``), which is what makes the index
    binary-searchable; the flag itself doesn't need the sort.

    Output: ``(surt_key, url, warc_ts, digest, n_bytes, is_revisit)``.
    """
    from pyspark.sql import Window

    x = captures.select(
        surt_key(F.col(url_col)).alias("surt_key"),
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        F.md5(body_col).alias("digest"),
        F.octet_length(body_col).cast("bigint").alias("n_bytes"),
    )
    w = Window.partitionBy("surt_key", "digest").orderBy("warc_ts", "url")
    return x.select(
        "*", (F.row_number().over(w) > 1).alias("is_revisit")
    )


def pages_from_warc(records: DataFrame) -> DataFrame:
    """Adapt parsed response records to the engine's pages-table shape
    (url, warc_ts, html) — the input every crawl/pipeline entry point
    takes. Non-response and quarantined records drop here; the caller
    can audit them from the raw parse output."""
    return (
        records.filter(
            F.col("parse_error").isNull()
            & (F.col("warc_type") == "response")
        )
        .select(
            F.col("target_uri").alias("url"),
            F.to_timestamp(
                F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
            ).alias("warc_ts"),
            F.decode(F.col("body"), "UTF-8").alias("html"),
        )
    )
