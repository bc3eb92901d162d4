"""Mergeable cardinality sketches with exact audits.

At 10^10 URLs, ``countDistinct`` is a full shuffle of every distinct
key; a HyperLogLog register array is 2^b bytes per (group, column) and
merges with ``max`` — the standard cardinality tool for frontier /
seen-set / vocabulary dashboards (Flajolet 2007, the same estimator
behind Spark's ``approx_count_distinct``). This implementation is the
ENGINE-EXACT twin: the hash is the repo's md5→60-bit pattern
(sampling.py), every register step is integer arithmetic, and the one
estimate division happens on exact integer inputs — so the DuckDB
oracle reproduces the sketch bit-for-bit and the gate can be an exact
comparison, with the estimate's ERROR audited against the true
distinct count in the same row. Production would swap the one hash
line for xxhash64 and keep every plan shape.

Register build: one map-side projection + a groupBy(bucket) max — the
shuffle carries at most m=2^b rows per audited column. The finalize is
a single-row aggregate (register table is m-bounded, never data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_BITS = 10  # m = 1024 registers; ~3.25% standard error


def _alpha(m: int) -> float:
    # Flajolet's alpha_m for m >= 128
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str, b: int = HLL_BITS) -> DataFrame:
    """(bucket, rho) register table — max trailing-zero rank per bucket.

    h = md5-60-bit(value); bucket = low ``b`` bits, payload w = the
    remaining 60-b bits; rho = trailing zeros of w + 1 (K = 60-b+1
    when w = 0). Distinct values first (register build only needs the
    distinct stream; the pre-reduction is itself map-side-partialed).
    """
    k_max = 60 - b + 1
    vals = df.select(F.col(col).cast("string").alias("_v")).na.drop().distinct()
    h = F.conv(F.substring(F.md5(F.col("_v")), 1, 15), 16, 10).cast("long")
    hashed = vals.select(h.alias("_h")).select(
        (F.col("_h") % (1 << b)).alias("bucket"),
        F.shiftright("_h", b).alias("_w"),
    )
    tz = F.length(F.bin("_w")) - F.length(
        F.regexp_replace(F.bin("_w"), "0+$", "")
    )
    rho = F.when(F.col("_w") == 0, F.lit(k_max)).otherwise(tz + 1)
    return (
        hashed.select("bucket", rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, b: int = HLL_BITS) -> DataFrame:
    """One-row (m, v_zero, est) from a register table.

    est = alpha_m * m^2 / Σ 2^-rho, computed from EXACT integers:
    S = Σ 2^(K-rho) over registers + v_zero * 2^K, one double division
    at the end. Linear counting (m * ln(m / v_zero)) below 2.5 m with
    empty registers, per the original paper.
    """
    m = 1 << b
    k_max = 60 - b + 1
    agg = registers.agg(
        F.count("*").cast("long").alias("nz"),
        F.coalesce(
            # pyspark's shiftleft() only takes a literal bit count;
            # the SQL form accepts a column expression
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k_max} - rho)")),
            F.lit(0),
        )
        .cast("long")
        .alias("s_ne"),
    )
    v = (F.lit(m) - F.col("nz")).cast("long")
    s = F.col("s_ne") + v * F.lit(1 << k_max).cast("long")
    raw = (
        F.lit(_alpha(m))
        * F.lit(float(m) * float(m) * float(1 << k_max))
        / s.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        v.alias("v_zero"),
        F.round(est, 4).alias("est"),
    )


def hll_distinct(df: DataFrame, col: str, b: int = HLL_BITS) -> DataFrame:
    """One-row (m, v_zero, est) distinct-count sketch for ``col``."""
    return hll_estimate(hll_registers(df, col, b), b)


# --- count-min sketch -------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_counters(
    items: DataFrame, col: str, d: int = CMS_DEPTH, w: int = CMS_WIDTH
) -> DataFrame:
    """Count-min counter table from an OCCURRENCE stream (one row per
    occurrence): d independent md5 hash rows x w buckets — the
    heavy-hitter / frequency sketch (Cormode 2005) whose counters are
    plain ``sum``-mergeable rows, bounded at d*w regardless of stream
    size. The d-way fan-out is map-side (explode of a d-literal
    array); the only shuffle is the (j, bucket)-keyed count with
    map-side partials — hot tokens collapse before moving.

    Output: (j, bucket, c).
    """
    j = F.explode(F.array([F.lit(i) for i in range(d)])).alias("j")
    fan = items.select(F.col(col).alias("_v"), j)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("j").cast("string"), F.lit("|"), F.col("_v"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        fan.select("j", (h % w).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_estimate(
    counters: DataFrame,
    terms: DataFrame,
    col: str = "term",
    d: int = CMS_DEPTH,
    w: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each term: min over the d counters
    the term hashes into (collisions only ever INFLATE — the one-sided
    error bound the audit gate checks). The counter table — bounded at
    d*w rows regardless of corpus size — is the broadcast side (Spark
    cannot build-left on a left outer join, so broadcasting the probe
    side would silently fall back to a shuffle).

    Output: (term, est).
    """
    j = F.explode(F.array([F.lit(i) for i in range(d)])).alias("j")
    probes = terms.select(F.col(col).alias("term"), j)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("j").cast("string"), F.lit("|"), F.col("term"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    keyed = probes.select("term", "j", (h % w).alias("bucket"))
    return (
        keyed.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est"))
    )


def hll_set_overlap(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    b: int = HLL_BITS,
) -> DataFrame:
    """Overlap between two key sets from their HLL registers alone —
    how many URLs do two crawl snapshots share, without shuffling
    either key set: union = register-wise MAX merge (the mergeability
    the pytest pins), intersection = inclusion-exclusion over the
    three estimates. The register tables are 2^b rows each; nothing
    data-sized moves.

    Output, one row: (est_a, est_b, est_union, est_inter) — rounded
    like hll_estimate; est_inter can go slightly negative on tiny
    overlaps (standard inclusion-exclusion noise; audit rows carry the
    exact truth in the gate).
    """
    ra = hll_registers(df_a, col_a, b)
    rb = hll_registers(df_b, col_b, b)
    ru = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    ea = hll_estimate(ra, b).select(F.col("est").alias("est_a"))
    eb = hll_estimate(rb, b).select(F.col("est").alias("est_b"))
    eu = hll_estimate(ru, b).select(F.col("est").alias("est_union"))
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_inter"),
        )
    )


# --- grouped registers + HyperBall ------------------------------------------


def hll_grouped_registers(
    pairs: DataFrame, group_col: str, val_col: str, b: int = HLL_BITS
) -> DataFrame:
    """(group, bucket, rho) — one register table per group key, built
    from (group, value) pairs; the per-node state HyperBall iterates."""
    k_max = 60 - b + 1
    d = pairs.select(
        F.col(group_col).alias("g"), F.col(val_col).cast("string").alias("_v")
    ).na.drop().distinct()
    h = F.conv(F.substring(F.md5(F.col("_v")), 1, 15), 16, 10).cast("long")
    hashed = d.select("g", h.alias("_h")).select(
        "g",
        (F.col("_h") % (1 << b)).alias("bucket"),
        F.shiftright("_h", b).alias("_w"),
    )
    tz = F.length(F.bin("_w")) - F.length(
        F.regexp_replace(F.bin("_w"), "0+$", "")
    )
    rho = F.when(F.col("_w") == 0, F.lit(k_max)).otherwise(tz + 1)
    return (
        hashed.select("g", "bucket", rho.cast("int").alias("rho"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_grouped_estimate(regs: DataFrame, b: int = HLL_BITS) -> DataFrame:
    """(g, est) — hll_estimate's arithmetic per group key."""
    m = 1 << b
    k_max = 60 - b + 1
    agg = regs.groupBy("g").agg(
        F.count("*").cast("long").alias("nz"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k_max} - rho)")),
            F.lit(0),
        )
        .cast("long")
        .alias("s_ne"),
    )
    v = (F.lit(m) - F.col("nz")).cast("long")
    s = F.col("s_ne") + v * F.lit(1 << k_max).cast("long")
    raw = (
        F.lit(_alpha(m))
        * F.lit(float(m) * float(m) * float(1 << k_max))
        / s.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select("g", F.round(est, 4).alias("est"))


def hyperball(
    edges: DataFrame,
    t_max: int = 2,
    b: int = HLL_BITS,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): per-node neighborhood-ball
    sizes |B_t(v)| estimated by iterating one HLL register table per
    node — B_t = B_{t-1} ∪ (union of out-neighbors' B_{t-1}) becomes
    a register-wise MAX, so each radius step is ONE join of the edge
    table against m-bounded per-node registers plus a max-agg; the
    web-scale way to ask "how much of the graph is within t clicks of
    this host" (and, summed, the distance distribution) without any
    BFS frontier materialization.

    Output: (host, est_ball_1, ..., est_ball_{t_max}) — exact-gate
    safe like every sketch here (md5 hashing, integer registers).
    """
    e = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("t")
    ).dropDuplicates(["s", "t"]).persist()
    hosts = (
        e.select(F.col("s").alias("host"))
        .unionByName(e.select(F.col("t").alias("host")))
        .dropDuplicates(["host"])
    )
    regs = hll_grouped_registers(
        hosts.select(F.col("host").alias("g"), F.col("host").alias("v")),
        "g",
        "v",
        b,
    ).localCheckpoint(eager=True)
    out = hosts
    for t in range(1, t_max + 1):
        pulled = (
            e.join(regs.select(F.col("g").alias("t"), "bucket", "rho"), "t")
            .select(F.col("s").alias("g"), "bucket", "rho")
        )
        regs = (
            regs.unionByName(pulled)
            .groupBy("g", "bucket")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
        est = hll_grouped_estimate(regs, b).select(
            F.col("g").alias("host"), F.col("est").alias(f"est_ball_{t}")
        )
        out = out.join(est, "host", "left")
    e.unpersist()
    return out
