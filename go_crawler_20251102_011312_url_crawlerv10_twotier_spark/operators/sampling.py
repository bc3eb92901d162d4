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


_DSIR_BUCKETS = 10_000


def _hashed_grams(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(doc_id, bucket) — one row per unigram/bigram OCCURRENCE, the
    gram hashed into ``n_buckets``. Entirely map-side: tokens and the
    consecutive-pair bigrams are built as arrays inside one projection
    (zip of the two shifted slices), so no window and no shuffle exist
    — the n-gram stream never has to be ordered, only counted. md5
    (not xxhash64) so the DuckDB oracle lands every gram in the same
    bucket; production would swap the one hash line."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    n = F.size(toks)
    bigrams = F.when(
        n >= F.lit(2),
        F.zip_with(
            F.slice(toks, 1, n - F.lit(1)),
            F.slice(toks, 2, n - F.lit(1)),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(toks, bigrams)).alias("gram"),
    )
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("long")
    return grams.select("doc_id", (h % n_buckets).alias("bucket"))


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = _DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data selection scoring (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every raw document by how target-like its hashed n-gram profile
    is. Per bucket ``b``, the Laplace-smoothed log-likelihood ratio

        lr(b) = ln(t_cnt+1) - ln(t_tot+B) - ln(r_cnt+1) + ln(r_tot+B)

    (target vs raw unigram+bigram occurrence counts); a document's
    importance is the sum of ``lr`` over its gram occurrences —
    ``ln p_target(doc)/p_raw(doc)`` under the hashed bag-of-grams
    model. Selection then keeps the top slice / resamples by weight
    (compose with ``domain_cap_sample``-style top-K or the md5
    samplers above).

    Determinism: ``lr`` is materialized as INTEGER micro-nats — one
    double chain per BUCKET (four lns of exact integers, fixed
    association, one multiply, one round) — and the per-doc score is
    a sum of integers, so it is independent of aggregation order and
    engine (the same trick as source_quality_rollup's micro-units).

    Scale shape: tokenize/hash is map-side (no window — bigrams are a
    zip of shifted array slices); the two count aggregations are
    bucket-keyed with map-side partials (≤ B groups); the lr table is
    ≤ B rows, broadcast back onto the gram stream; one groupBy(doc_id)
    integer sum. The scoring pass re-tokenizes rather than
    materializing the doc×gram table (grams outweigh docs in bytes —
    at 100 TB recompute beats spill). Docs with no grams surface with
    score 0 / n_grams 0 — full decision surface.

    Output: ``(doc_id, score_micro, n_grams)``, score in micro-nats.
    """
    raw_g = _hashed_grams(docs, id_col, text_col, n_buckets)
    tgt_g = _hashed_grams(target, id_col, text_col, n_buckets)
    raw = raw_g.groupBy("bucket").agg(F.count("*").cast("bigint").alias("r_cnt"))
    tgt = tgt_g.groupBy("bucket").agg(F.count("*").cast("bigint").alias("t_cnt"))
    r_tot = raw.agg(F.sum("r_cnt").alias("r_tot"))
    t_tot = tgt.agg(F.sum("t_cnt").alias("t_tot"))
    b = F.lit(float(n_buckets))
    # fixed association ((a-b)-c)+d, mirrored verbatim by the oracle
    lr_expr = (
        F.log(F.coalesce(F.col("t_cnt"), F.lit(0)).cast("double") + F.lit(1.0))
        - F.log(F.col("t_tot").cast("double") + b)
        - F.log(F.col("r_cnt").cast("double") + F.lit(1.0))
        + F.log(F.col("r_tot").cast("double") + b)
    )
    lr = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(t_tot))
        .select(
            "bucket",
            F.round(F.lit(1_000_000.0) * lr_expr, 0)
            .cast("bigint")
            .alias("lr_micro"),
        )
    )
    scored = (
        raw_g.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("lr_micro").cast("bigint").alias("score_micro"),
            F.count("*").cast("bigint").alias("n_grams"),
        )
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("score_micro", F.lit(0)).cast("bigint").alias("score_micro"),
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
    )


def importance_resample(
    scored: DataFrame,
    k: int = 100,
    temperature: float = 1.0,
    id_col: str = "doc_id",
    score_col: str = "score_micro",
) -> DataFrame:
    """Gumbel-top-k importance resampling — the selection step DSIR
    actually performs: draw ``k`` documents WITHOUT replacement with
    probability ∝ exp(score / temperature). The Gumbel-max trick makes
    that a pure top-k: ``key = score + T·gumbel`` where ``gumbel =
    -ln(-ln(u))`` and ``u`` is this engine's reproducible md5 uniform
    ((bucket+0.5)/B — never 0 or 1), so the "random" draw is a pure
    function of the doc id: re-runs, resumes and both engines pick the
    SAME k documents.

    Determinism: ``g_micro = round(1e6·T·gumbel)`` is an integer (one
    double chain per row, fixed association, mirrored by the oracle);
    ``key_micro = score_micro + g_micro`` is an integer sum. Ties
    cannot happen across docs with equal keys thanks to the doc_id
    tie-break, so membership is a total order.

    Scale shape: NO global sort and no single-partition window. The
    top-k is TakeOrderedAndProject (per-partition heaps, driver merge
    of k rows); the k-th element's ``(key_micro, -doc_id)`` struct is
    reduced to a scalar threshold and broadcast back; membership is a
    map-side struct comparison. Full decision surface: every input row
    surfaces with its key and ``keep``.

    Output: ``(doc_id, score_micro, g_micro, key_micro, keep)``.
    """
    idc = F.col(id_col)
    h = F.conv(F.substring(F.md5(idc.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    u = ((h % F.lit(1_000_000)).cast("double") + F.lit(0.5)) / F.lit(
        1_000_000.0
    )
    g_micro = (
        F.round(F.lit(1_000_000.0 * temperature) * -F.log(-F.log(u)), 0)
        .cast("bigint")
        .alias("g_micro")
    )
    base = scored.select(
        idc.alias("doc_id"),
        F.col(score_col).cast("bigint").alias("score_micro"),
        g_micro,
    ).withColumn("key_micro", F.col("score_micro") + F.col("g_micro"))
    ord_struct = F.struct(F.col("key_micro"), (-F.col("doc_id")).alias("nid"))
    topk = base.orderBy(
        F.col("key_micro").desc(), F.col("doc_id").asc()
    ).limit(int(k))
    threshold = topk.agg(F.min(ord_struct).alias("thr"))
    return (
        base.crossJoin(F.broadcast(threshold))
        .select(
            "doc_id",
            "score_micro",
            "g_micro",
            "key_micro",
            (ord_struct >= F.col("thr")).alias("keep"),
        )
    )
