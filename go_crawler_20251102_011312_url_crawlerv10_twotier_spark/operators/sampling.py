"""Deterministic stratified sampling for training-mix construction.

A 100 TB corpus is never trained on uniformly: the pipeline assigns
each stratum (language, source, quality band ...) a target rate and
samples documents at that rate. Two properties matter at scale and
both come from hashing instead of RNG:

- reproducible: keep/drop is a pure function of the doc id, so a
  re-run, a resumed job, or a different partitioning produces the
  SAME sample (rand() does not — it is per-task-seed dependent);
- uniform within stratum: md5 is effectively uniform over the id
  space, so realized rates converge to targets per stratum.

md5 (not xxhash64) so the DuckDB oracle recomputes the very same
buckets bit-for-bit — the same trade the dedup operators make.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# per-mille keep rates per language stratum — the up/down-sampling mix
# a multilingual training run uses (English-heavy corpus downsampled,
# long tail kept at higher rates). Values are fixture-meaningful, the
# OPERATOR takes any dict.
DEFAULT_MIX_PERMILLE: dict[str, int] = {
    "en": 500,
    "de": 800,
    "fr": 800,
    "es": 650,
    "zh": 350,
}
DEFAULT_PERMILLE = 100  # unknown stratum: keep 10%

_BUCKETS = 1000


def training_mix_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    rates_permille: dict[str, int] | None = None,
    default_permille: int = DEFAULT_PERMILLE,
) -> DataFrame:
    """Stratified hash-threshold sampler: keep a row iff its md5
    bucket (0..999) < the stratum's per-mille rate; weight = 1000/rate
    is the inverse-propensity factor a loss reweighting uses so the
    sampled mix is unbiased for per-stratum statistics.

    Map-only: the rate table is a literal CASE (strata counts are
    policy-sized, tens not millions), so there is no join and no
    shuffle — the operator's 100 TB cost is the scan. If strata ever
    came from data, the same shape becomes a broadcast join.

    Output: (doc_id, stratum, bucket, rate_permille, keep, weight) —
    every input row, keep flagging the sample membership (callers
    filter; the gate checks the full decision surface).
    """
    rates = DEFAULT_MIX_PERMILLE if rates_permille is None else rates_permille
    stratum = F.col(stratum_col)
    rate = None
    for k, v in rates.items():
        rate = F.when(stratum == k, v) if rate is None else rate.when(stratum == k, v)
    rate = F.lit(default_permille) if rate is None else rate.otherwise(default_permille)
    idc = F.col(id_col)
    h = F.conv(F.substring(F.md5(idc.cast("string")), 1, 15), 16, 10).cast("long")
    bucket = h % _BUCKETS
    rate = rate.cast("int")
    return df.select(
        idc.alias("doc_id"),
        stratum.alias("stratum"),
        bucket.alias("bucket"),
        rate.alias("rate_permille"),
        (bucket < rate).alias("keep"),
        F.round(F.lit(float(_BUCKETS)) / rate, 6).alias("weight"),
    )


def domain_cap_sample(
    docs: DataFrame,
    max_per_host: int = 10,
    id_col: str = "doc_id",
    host_col: str = "host",
    quality_col: str = "quality",
    n_salts: int = 16,
) -> DataFrame:
    """Dominant-domain mitigation: keep at most ``max_per_host`` docs
    per host, highest ``quality`` first (doc_id breaks ties, so the
    cut is deterministic). The rate-based sampler above balances
    STRATA (language, source); this balances the host long-tail — a
    mega-host contributing 10^8 pages must not be 10 % of the mix
    just because it was 10 % of the crawl.

    Skew shape (politeness.schedule's salted two-phase top-K,
    politeness.py:100-113 — the same mega-host problem in corpus
    form): a naive ``row_number() OVER (PARTITION BY host)`` puts the
    whole mega-host through one window task. Phase 1 ranks within
    ``(host, salt)`` — parallel across ``n_salts`` — and keeps at most
    ``max_per_host`` rows per salted group; phase 2 re-ranks the
    ≤ ``max_per_host × n_salts`` survivors per host, an exactly
    equivalent but tiny window. Rows cut in phase 1 are provably
    outside the global top-K, so the full decision surface is
    reconstructable: they surface with ``keep = false, rank = NULL``
    (a NULL rank reads "below the cap", not "unknown").

    Output, one row per input doc:
    ``(doc_id, host, quality, rank, keep)``.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("host"),
        F.col(quality_col).cast("double").alias("quality"),
    )
    order = [F.col("quality").desc(), F.col("doc_id").asc()]
    salted = base.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(n_salts))
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    phase1 = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.lit(int(max_per_host)))
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = phase1.withColumn("_r2", F.row_number().over(w2))
    kept = ranked.filter(F.col("_r2") <= F.lit(int(max_per_host)))
    out = base.join(
        kept.select("doc_id", F.col("_r2").alias("rank")), "doc_id", "left"
    )
    return out.select(
        "doc_id",
        "host",
        "quality",
        F.col("rank").cast("int").alias("rank"),
        F.col("rank").isNotNull().alias("keep"),
    )


_TEMP_BUCKETS = 1_000_000


def lang_temperature_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Temperature-based language rebalancing (the XLM / mT5 mix rule):
    sample language ``l`` so its share of the output is proportional to
    ``n_l ** alpha`` instead of ``n_l``. ``training_mix_sample`` above
    takes POLICY rates; this derives the rate from the corpus' own
    language histogram — the form multilingual pretraining actually
    uses (alpha ~ 0.3-0.7 upweights the long tail relative to English).

    Realized as pure downsampling: keep rate
    ``k_l = (n_min / n_l) ** (1 - alpha)`` where ``n_min`` is the
    smallest language's count — the rarest language is kept whole
    (k = 1) and every other language is cut toward it. Keep/drop is the
    same md5-bucket hash threshold as the stratified sampler
    (reproducible under any partitioning / resume), with the threshold
    materialized as an INTEGER bucket cut per language:
    ``threshold_l = max(floor(B * k_l), 1)``, ``keep = bucket <
    threshold_l`` (the floor of 1 keeps ~1 ppm of a language so
    extreme it would otherwise round to an empty — and unweightable —
    stratum).
    The per-row decision is integer-vs-integer — the only floating
    point is one correctly-rounded-by-IEEE chain per LANGUAGE
    (divide, sqrt, multiply, floor at the default ``alpha = 0.5``), so
    any engine reproduces the exact same sample. ``alpha != 0.5``
    routes through ``pow``, which is not guaranteed correctly rounded
    — fine for production, not used by the bit-exact gate.

    Scale shape: ONE map-side-partial aggregation over (lang) — tens of
    groups — a scalar min attach on that tiny table, and a broadcast
    join of the per-language thresholds back onto the corpus. The
    100 TB cost is the scan; no document-side shuffle exists.

    Output, one row per input doc (callers filter on ``keep``):
    ``(doc_id, lang, n_lang, bucket, threshold, keep, weight)`` with
    ``weight = B / threshold`` the inverse-propensity factor.
    """
    idc = F.col(id_col)
    lang = F.col(lang_col)
    counts = docs.groupBy(lang.alias("lang")).agg(
        F.count("*").cast("bigint").alias("n_lang")
    )
    n_min = counts.agg(F.min("n_lang").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n_lang").cast("double")
    k = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    thresholds = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_lang",
        F.greatest(
            F.floor(F.lit(float(_TEMP_BUCKETS)) * k), F.lit(1).cast("bigint")
        ).cast("bigint").alias("threshold"),
    )
    h = F.conv(F.substring(F.md5(idc.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    bucket = (h % _TEMP_BUCKETS).alias("bucket")
    return (
        docs.select(idc.alias("doc_id"), lang.alias("lang"), bucket)
        .join(F.broadcast(thresholds), "lang")
        .select(
            "doc_id",
            "lang",
            "n_lang",
            "bucket",
            "threshold",
            (F.col("bucket") < F.col("threshold")).alias("keep"),
            F.round(
                F.lit(float(_TEMP_BUCKETS)) / F.col("threshold"), 6
            ).alias("weight"),
        )
    )
