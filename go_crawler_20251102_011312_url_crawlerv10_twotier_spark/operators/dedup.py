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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# J1 — crawl seen-set
# ---------------------------------------------------------------------------


def seen_anti_join(candidates: DataFrame, seen: DataFrame, key: str = "url_norm") -> DataFrame:
    """crawler_twotier.go:195,224-245 as a left-anti join."""
    return candidates.join(seen.select(key), key, "left_anti")


def _bloom_positions(h, m: int, n_hashes: int):
    """Double-hashing bit positions for a vector of 64-bit hashes.

    pos_i = (h1 + i*h2) mod m with h1/h2 the two 32-bit halves —
    Kirsch-Mitzenmacher: k independent-enough probes from one hash.
    Vectorized numpy; works on uint64 arrays.
    """
    h = h.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = (h >> np.uint64(32)).astype(np.int64) | 1  # odd => full-period
    return [((h1 + i * h2) % m).astype(np.int64) for i in range(n_hashes)]


def build_bloom_shards(
    seen: DataFrame,
    key: str = "url_norm",
    n_shards: int = 64,
    bits_per_shard: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Sharded Bloom state over the seen set (north_rule: partitioned
    Bloom/cuckoo URL-seen keyed by xxhash64(url)).

    One shuffle: keys hash JVM-side (xxhash64), shard = h mod
    n_shards, then a grouped Arrow pass packs each shard's bitset with
    numpy. Output: (shard int, bloom binary) — n_shards small rows
    that broadcast to the probe side. At 10^10 keys the state is
    n_shards x bits/8 bytes and each shard builds independently; scale
    by raising n_shards, never by growing a single filter.
    """
    m = bits_per_shard
    k = n_hashes

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m, dtype=bool)
        for pos in _bloom_positions(pdf["h"].to_numpy(), m, k):
            bits[pos] = True
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "bloom": [np.packbits(bits).tobytes()]}
        )

    hashed = seen.select(F.xxhash64(key).alias("h")).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int")
    )
    return hashed.groupBy("shard").applyInPandas(pack, "shard int, bloom binary")


def bloom_probe_col(h_col, bloom_col, bits_per_shard: int = 1 << 20, n_hashes: int = 5):
    """might_contain as an Arrow-batched pandas UDF over (hash, bloom)."""
    m = bits_per_shard
    k = n_hashes

    @F.pandas_udf("boolean")
    def probe(h: pd.Series, bloom: pd.Series) -> pd.Series:
        out = np.zeros(len(h), dtype=bool)
        if len(h) == 0:
            return pd.Series(out)
        hv = h.to_numpy(dtype=np.int64, na_value=0)
        blooms = bloom.to_numpy(dtype=object)
        # group rows by identical bloom blob (one per shard) and probe
        # each group vectorized
        ids = pd.Series([id(b) if b is not None else 0 for b in blooms])
        for _, idx in ids.groupby(ids).groups.items():
            idx = np.asarray(idx)
            b = blooms[idx[0]]
            if b is None:
                continue  # no shard state => might_contain = False
            bits = np.unpackbits(np.frombuffer(b, dtype=np.uint8))
            hit = np.ones(len(idx), dtype=bool)
            for pos in _bloom_positions(hv[idx], m, k):
                hit &= bits[pos].astype(bool)
            out[idx] = hit
        return pd.Series(out)

    return probe(h_col, bloom_col)


def bloom_prefilter(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_norm",
    n_shards: int = 64,
    bits_per_shard: int = 1 << 20,
    n_hashes: int = 5,
):
    """Sharded-Bloom pre-probe in front of the exact anti-join (O4).

    Builds the shard table over ``seen`` (build_bloom_shards),
    broadcast-joins it to the candidates on shard id, and probes.
    Rows where the probe is False are DEFINITELY new and skip the
    exact-join shuffle; rows where it is True (incl. false positives)
    fall through to the authoritative anti-join — results stay exact.

    Returns (definitely_new, maybe_seen).
    """
    shards = build_bloom_shards(seen, key, n_shards, bits_per_shard, n_hashes)
    probed = (
        candidates.withColumn("_h", F.xxhash64(key))
        .withColumn("_shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
        .join(F.broadcast(shards), F.col("_shard") == F.col("shard"), "left")
        .withColumn(
            "_maybe",
            F.coalesce(
                bloom_probe_col(F.col("_h"), F.col("bloom"), bits_per_shard, n_hashes),
                F.lit(False),
            ),
        )
        .drop("shard", "bloom")
    )
    aux = ("_h", "_shard", "_maybe")
    definitely_new = probed.filter(~F.col("_maybe")).drop(*aux)
    maybe_seen = probed.filter(F.col("_maybe")).drop(*aux)
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
    Output: (id_a, id_b, n_bands) with id_a < id_b, distinct.

    The bands come from ONE explode over the signature (not a
    per-band union — that would re-run the whole minhash lineage once
    per band per join side), and the banded frame is persisted so the
    self-join's two sides read one materialization instead of
    recomputing the signatures twice more.
    """
    n_bands = k // rows_per_band
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|",
                *[F.col(f"h{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
            ).alias("bkey"),
        )
        for b in range(n_bands)
    ]
    banded = (
        sig.select("id", F.explode(F.array(*band_structs)).alias("bb"))
        .select("id", "bb.band", "bb.bkey")
        .persist()
    )
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
