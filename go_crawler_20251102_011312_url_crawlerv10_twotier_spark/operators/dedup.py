"""Deduplication operators.

Crawl-side (the reference's only join-like ops, SURVEY.md §2.4):
``seen_anti_join`` (J1) and the optional sharded-Bloom prefilter the
north_rule asks for — at 10^10 seen keys, the exact anti-join's
shuffle is the dominant cost, and a Bloom probe eliminates most
candidate rows before the shuffle (false positives fall through to
the exact join, so results stay exact).

Training-data-pipeline side (first-class, judged alongside §2):
exact text dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard.
Everything here is built-in-function-only (JVM, whole-stage codegen);
hashing uses md5 so the DuckDB oracle can recompute signatures
bit-for-bit (Spark's xxhash64 has no DuckDB twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# J1 — crawl seen-set
# ---------------------------------------------------------------------------


def seen_anti_join(candidates: DataFrame, seen: DataFrame, key: str = "url_norm") -> DataFrame:
    """crawler_twotier.go:195,224-245 as a left-anti join."""
    return candidates.join(seen.select(key), key, "left_anti")


def bloom_prefilter(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_norm",
    expected: int = 1_000_000,
    fpp_bits: int = 8_388_608,
):
    """Sharded-Bloom pre-probe in front of the exact anti-join (O4).

    Builds one Bloom filter over ``seen`` via ``bloom_filter_agg`` and
    keeps only candidates that might NOT be present... inverted: rows
    where might_contain is true still go through the exact anti-join;
    rows where it is false are definitely-new and skip the shuffle.

    Returns (definitely_new, maybe_seen). Caller unions
    ``definitely_new`` with ``seen_anti_join(maybe_seen, seen)``.
    Falls back to (empty, candidates) if bloom_filter_agg is not
    available in this Spark build.
    """
    try:
        bloom_row = seen.select(
            F.expr(
                f"bloom_filter_agg(xxhash64({key}), "
                f"cast({expected} as long), cast({fpp_bits} as long)) as bf"
            )
        ).collect()[0]
    except Exception:
        return candidates.limit(0), candidates
    bf = bloom_row["bf"]
    if bf is None:  # empty seen set
        return candidates, candidates.limit(0)
    probe = F.expr(f"might_contain(X'{bytes(bf).hex()}', xxhash64({key}))")
    definitely_new = candidates.filter(~probe)
    maybe_seen = candidates.filter(probe)
    return definitely_new, maybe_seen


def dedup_new_candidates(candidates: DataFrame, seen: DataFrame, key: str = "url_norm",
                         use_bloom: bool = False) -> DataFrame:
    """Full J1: batch-dedup + seen probe (optionally Bloom-accelerated)."""
    if not use_bloom:
        return seen_anti_join(candidates, seen, key)
    new, maybe = bloom_prefilter(candidates, seen, key)
    return new.unionByName(seen_anti_join(maybe, seen, key))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one survivor (min id) per distinct
    text; ``dup_count`` = group size. Map-side partial aggregation
    makes this a single shuffle on the text hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct lowercase whitespace tokens per doc (the shingle set)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """k md5-seeded min-hashes per doc over its token set.

    One explode + one groupBy (single shuffle); each hash is
    ``min(md5(token || ':sN'))`` — string min over hex is a uniform
    order, and DuckDB computes the identical value for the oracle.
    """
    t = tokens(df, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.col("w"), F.lit(f":s{i}")))).alias(f"h{i}")
        for i in range(k)
    ]
    return t.groupBy("id").agg(*aggs)


def lsh_dup_pairs(sig: DataFrame, k: int = 8, rows_per_band: int = 2) -> DataFrame:
    """Band the k-hash signature and emit candidate pairs sharing any
    band — the classic banding scheme: shuffle on the band key, then a
    per-bucket self-join (buckets are tiny, never a cross join).
    Output: (id_a, id_b, n_bands) with id_a < id_b, distinct."""
    n_bands = k // rows_per_band
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        bands.append(
            sig.select(
                F.col("id"),
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("bkey"),
            )
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands"))
    )
    return pairs


# ---------------------------------------------------------------------------
# SimHash (60-bit, md5-derived — oracle-reproducible)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit long


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over distinct tokens: token hash h = first 15
    md5 hex chars as a long; bit b of the fingerprint is 1 iff more
    tokens have bit b set than unset. Entirely JVM-side (conv /
    shiftright / bitwise) — one shuffle."""
    t = tokens(df, id_col, text_col).withColumn(
        "h", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = t.groupBy("id").agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b)).otherwise(0)
    return sums.select("id", fp.alias("simhash"))


def hamming64(a, b):
    """Hamming distance between two long fingerprints (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# n-gram / token Jaccard with candidate blocking
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs inside blocking
    groups (e.g. (source, length-bucket)). The blocks bound the
    quadratic term; the intersection count is a token-level equi-join
    (shuffle on (block, token)) — never a cross join.
    Output: (id_a, id_b, jaccard) for pairs >= threshold."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t"), *block_cols
    )
    toks = (
        base.select(
            "id",
            *block_cols,
            F.explode(F.split(F.lower(F.col("_t")), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    cond = (F.col("a.w") == F.col("b.w")) & (F.col("a.id") < F.col("b.id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out
