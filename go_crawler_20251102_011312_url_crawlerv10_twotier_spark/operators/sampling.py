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

from pyspark.sql import DataFrame
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
