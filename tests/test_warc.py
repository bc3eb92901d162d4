"""WARC container ingestion (sources/warc.py): length-delimited
record parsing, quarantine-on-malformed (the S7 panic-path analogue),
file-based ingestion via binaryFile, and the pages-table adapter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources.warc import (
    pages_from_warc,
    parse_warc,
    read_warc_dir,
)


def _rec(uri: str, date: str, body: bytes, wtype: str = "response") -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {uri}"
        f"\r\nWARC-Date: {date}\r\nContent-Length: {len(body)}\r\n\r\n"
    ).encode() + body + b"\r\n\r\n"


D = "2025-01-01T00:00:00Z"


def _blob_df(spark, rows):
    return spark.createDataFrame(rows, "blob_id string, blob binary")


def test_multi_record_blob_in_order(spark):
    blob = (
        _rec("https://a.x/1", D, b"body one")
        + _rec("https://a.x/2", D, b"")
        + _rec("https://a.x/3", D, b"third")
    )
    got = (
        parse_warc(_blob_df(spark, [("b0", blob)]))
        .orderBy("record_idx")
        .collect()
    )
    assert [(r.record_idx, r.target_uri, bytes(r.body)) for r in got] == [
        (0, "https://a.x/1", b"body one"),
        (1, "https://a.x/2", b""),
        (2, "https://a.x/3", b"third"),
    ]
    assert all(r.parse_error is None for r in got)
    assert all(r.warc_version == "WARC/1.0" for r in got)
    assert [r.content_length for r in got] == [8, 0, 5]


def test_payload_containing_warc_magic_does_not_split(spark):
    """The killer case for any delimiter-scan parser: the PAYLOAD
    contains a byte-exact fake record header. Length-delimited hops
    must sail straight over it."""
    trap = b"look: \r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n inside"
    blob = _rec("https://a.x/trap", D, trap) + _rec("https://a.x/after", D, b"ok")
    got = (
        parse_warc(_blob_df(spark, [("b0", blob)]))
        .orderBy("record_idx")
        .collect()
    )
    assert len(got) == 2
    assert bytes(got[0].body) == trap
    assert got[1].target_uri == "https://a.x/after"


def test_malformed_records_quarantine(spark):
    ok = _rec("https://a.x/ok", D, b"fine")
    truncated = ok + (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a.x/t"
        b"\r\nContent-Length: 100\r\n\r\nshort"
    )
    bad_magic = b"HTTP/1.1 200 OK\r\n\r\n"
    bad_len = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: nope\r\n\r\n"
    out = parse_warc(
        _blob_df(
            spark,
            [("trunc", truncated), ("magic", bad_magic), ("len", bad_len)],
        )
    ).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r.blob_id, []).append(r)
    # earlier good records survive; the bad one quarantines and stops
    trunc = sorted(by_blob["trunc"], key=lambda r: r.record_idx)
    assert trunc[0].parse_error is None and bytes(trunc[0].body) == b"fine"
    assert trunc[1].parse_error == "truncated-body"
    assert trunc[1].body is None
    assert [r.parse_error for r in by_blob["magic"]] == ["bad-magic"]
    assert [r.parse_error for r in by_blob["len"]] == ["bad-content-length"]


def test_read_warc_dir_and_pages_adapter(spark, tmp_path):
    """Real file round-trip: write .warc files, binaryFile-read them,
    adapt to the pages shape the crawl/pipeline entry points take.
    warcinfo records and quarantined rows drop in the adapter."""
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nmeta\r\n\r\n"
    )
    f1 = info + _rec("https://w.x/p1", "2025-01-01T00:00:05Z", b"<html>one</html>")
    f2 = _rec("https://w.x/p2", "2025-01-01T00:00:06Z", b"<html>two</html>")
    (tmp_path / "a.warc").write_bytes(f1)
    (tmp_path / "b.warc").write_bytes(f2)
    (tmp_path / "ignore.txt").write_bytes(b"not a warc")

    recs = read_warc_dir(spark, str(tmp_path))
    assert recs.filter("parse_error IS NOT NULL").count() == 0
    assert recs.count() == 3  # warcinfo + 2 responses

    pages = pages_from_warc(recs).orderBy("url").collect()
    assert [(r.url, r.html) for r in pages] == [
        ("https://w.x/p1", "<html>one</html>"),
        ("https://w.x/p2", "<html>two</html>"),
    ]
    assert [str(r.warc_ts) for r in pages] == [
        "2025-01-01 00:00:05",
        "2025-01-01 00:00:06",
    ]


def test_warc_corpus_feeds_crawl(spark, tmp_path):
    """Closure: a corpus shipped as WARC files drives the REAL crawl
    to the identical seen set the parquet-backed corpus produces —
    the adapter is load-bearing, not just parsed."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.frontier import (
        CrawlConfig,
        crawl,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources import (
        pages as pagesrc,
    )

    pages = pagesrc.synth_clean_pages(spark, "/root/testdata/sf0.001")
    seeds = spark.sql(pagesrc.seeds_sql())

    # ship the same corpus as 4 WARC files (test-scale collect: 500
    # rows; at real scale the archives arrive as files to begin with)
    rows = pages.select("url", "html").collect()
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    blobs = [b""] * 4
    for i, r in enumerate(rows):
        blobs[i % 4] += _rec(r.url, D, r.html.encode("utf-8"))
    for i, b in enumerate(blobs):
        (wdir / f"seg-{i}.warc").write_bytes(b)

    warc_pages = pages_from_warc(read_warc_dir(spark, str(wdir)))
    cfg = CrawlConfig()
    seen_parquet = {
        (r.url_norm, r.depth)
        for r in crawl(spark, pages, seeds, cfg).seen.collect()
    }
    seen_warc = {
        (r.url_norm, r.depth)
        for r in crawl(spark, warc_pages, seeds, cfg).seen.collect()
    }
    assert seen_warc == seen_parquet
    assert len(seen_warc) > 0


def test_null_blob_skipped(spark):
    df = spark.createDataFrame(
        [("x", None), ("y", _rec("https://a.x/y", D, b"z"))],
        "blob_id string, blob binary",
    )
    got = parse_warc(df).collect()
    assert len(got) == 1 and got[0].blob_id == "y"


def test_surt_key_canonicalization(spark):
    """SURT collapses scheme/port/www and sorts query params; distinct
    pages keep distinct keys."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources.warc import (
        surt_key,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("https://www.a.b.example:8080/p?z=1&a=2",),
            ("http://a.b.example/p?a=2&z=1",),
            ("https://a.b.example/p",),
            ("https://A.B.example",),
        ],
        "url string",
    )
    keys = [r.k for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert keys[0] == "example,b,a)/p?a=2&z=1"
    assert keys[1] == keys[0]  # scheme/port/www/param-order invariant
    assert keys[2] == "example,b,a)/p"
    assert keys[3] == "example,b,a)/"  # empty path -> '/'


def test_cdx_index_revisits(spark):
    """Same (surt, digest) at a later ts is a revisit; a changed body
    at the same url is NOT; url variants share one surt key."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources.warc import (
        cdx_index,
    )

    caps = spark.createDataFrame(
        [
            ("https://h.example/p", "2025-01-01T00:00:00Z", "v1"),
            ("https://www.h.example/p", "2025-01-02T00:00:00Z", "v1"),
            ("https://h.example/p", "2025-01-03T00:00:00Z", "v2"),
            ("https://h.example/p", "2025-01-04T00:00:00Z", "v2"),
        ],
        "url string, warc_ts string, body string",
    )
    rows = sorted(
        cdx_index(caps).collect(), key=lambda r: (r.warc_ts, r.url)
    )
    assert len({r.surt_key for r in rows}) == 1
    assert [r.is_revisit for r in rows] == [False, True, False, True]
    assert rows[0].digest != rows[2].digest
    assert rows[0].n_bytes == 2
