"""Per-host politeness scheduling (C1/O8 + O-1 priority ordering).

The reference throttles with a 30 ms per-domain delay over 20 workers
(crawler_twotier.go:64-69, config.go:13,15) and gives retried tasks a
2-level priority queue (downloader.go:33,123-145). In a batch frontier
engine both become *data*: each iteration schedules at most
``budget_per_host`` URLs per host, ordered by
``(priority DESC, depth ASC, url_norm ASC)`` — crawl-depth + host-rank
ordering per the north_rule; unscheduled rows stay in the frontier
backlog (no drops — unlike the reference's 50-attempt
PersistentEnqueue fallback, downloader.go:253-277).

Skew: mega-domains (~1/3 of all URLs on one host in the fixture) make
a naive ``row_number() OVER (PARTITION BY host)`` a single-task
hotspot at 10^10 scale. ``schedule`` therefore runs a salted two-phase
top-K: phase 1 ranks within ``(host, salt)`` — parallel across salts —
and keeps at most ``budget`` rows per salted group; phase 2 re-ranks
the survivors (≤ budget × n_salts rows per host, tiny) to pick the
exact global top-``budget`` per host. Result is identical to the
naive window, but the heavy sort never sees a whole mega-host in one
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _order_cols(df_priority: bool):
    cols = []
    if df_priority:
        cols.append(F.col("priority").desc())
    cols += [F.col("depth").asc(), F.col("url_norm").asc()]
    return cols


def schedule(
    frontier: DataFrame,
    budget_per_host: int | None,
    n_salts: int = DEFAULT_SALTS,
    host_ranks: DataFrame | None = None,
    global_budget: int | None = None,
    host_budgets: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``frontier`` into (scheduled, deferred) under the per-host
    budget. ``frontier`` needs columns: host, url_norm, depth, and
    optionally priority (boolean). budget None => everything scheduled.

    ``global_budget`` additionally caps the WHOLE iteration: after the
    per-host cut, the batch is trimmed to the global top-N by
    ``(priority DESC, host_rank DESC, depth ASC, url_norm ASC)`` —
    the north_rule's crawl-depth + host-rank priority queue.
    ``host_ranks`` is an optional small (host, host_rank double) table
    (e.g. harmonic-centrality or in-link scores); it is broadcast, and
    unranked hosts default to rank 0. The trim compiles to
    ``TakeOrderedAndProject`` (per-partition top-N, merge on driver-side
    limit — never a global sort), so it is exactly as scale-safe as the
    engine's other top-K paths. Ties are impossible: url_norm is unique
    within a frontier, so the cut is deterministic.
    """
    if budget_per_host is None and global_budget is None and host_budgets is None:
        return frontier, frontier.limit(0)
    if budget_per_host is None and host_budgets is None:
        scheduled = _global_trim(frontier, host_ranks, global_budget)
        deferred = frontier.join(
            scheduled.select("url_norm"), "url_norm", "left_anti"
        )
        return scheduled, deferred

    has_priority = "priority" in frontier.columns
    order = _order_cols(has_priority)

    # per-host budget override (e.g. robots Crawl-delay converted via
    # robots.delay_budgets): hosts in the table use their own budget,
    # the rest fall back to budget_per_host (None = unbounded). The
    # table is one small row per host — broadcast, no frontier shuffle.
    orig_frontier = frontier
    if host_budgets is not None:
        default_b = (
            F.lit(int(budget_per_host))
            if budget_per_host is not None
            else F.lit(None).cast("int")
        )
        frontier = frontier.join(
            F.broadcast(
                host_budgets.select("host", F.col("budget").alias("_hb"))
            ),
            "host",
            "left",
        ).withColumn("_budget", F.coalesce(F.col("_hb"), default_b)).drop("_hb")
        keep = lambda rn: F.col("_budget").isNull() | (rn <= F.col("_budget"))  # noqa: E731
    else:
        keep = lambda rn: rn <= F.lit(int(budget_per_host))  # noqa: E731

    salted = frontier.withColumn(
        "_salt", F.pmod(F.xxhash64("url_norm"), F.lit(n_salts))
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    phase1 = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(keep(F.col("_r1")))
        .drop("_r1")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = phase1.withColumn("_r2", F.row_number().over(w2)).drop("_salt")
    scheduled = ranked.filter(keep(F.col("_r2"))).drop("_r2")
    if host_budgets is not None:
        scheduled = scheduled.drop("_budget")
    if global_budget is not None:
        scheduled = _global_trim(scheduled, host_ranks, global_budget)

    # deferred = frontier minus scheduled (anti-join on the dedup key;
    # url_norm is unique within a frontier by construction)
    deferred = orig_frontier.join(
        scheduled.select("url_norm"), "url_norm", "left_anti"
    )
    return scheduled, deferred


def _global_trim(
    batch: DataFrame, host_ranks: DataFrame | None, global_budget: int
) -> DataFrame:
    """Global top-``global_budget`` of a scheduled batch by
    (priority DESC, host_rank DESC, depth, url_norm)."""
    cols = []
    if "priority" in batch.columns:
        cols.append(F.col("priority").desc())
    with_rank = host_ranks is not None
    if with_rank:
        batch = batch.join(
            F.broadcast(host_ranks.select("host", "host_rank")), "host", "left"
        ).withColumn("host_rank", F.coalesce("host_rank", F.lit(0.0)))
        cols.append(F.col("host_rank").desc())
    cols += [F.col("depth").asc(), F.col("url_norm").asc()]
    out = batch.orderBy(*cols).limit(global_budget)
    return out.drop("host_rank") if with_rank else out


def priority_order(frontier: DataFrame) -> DataFrame:
    """O-1 global scheduling order (downloader.go:123-145 two-level
    priority, FIFO ≈ deterministic tiebreak): priority DESC, depth,
    url_norm. Sorted *within partitions* after repartitioning by host —
    a total sort is never needed for scheduling, so no global shuffle."""
    has_priority = "priority" in frontier.columns
    return frontier.repartition("host").sortWithinPartitions(
        *_order_cols(has_priority)
    )


def schedule_by_domain(
    frontier: DataFrame,
    budget_per_domain: int | None,
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """:func:`schedule` at the PAY-LEVEL-domain granularity
    (functions/urlnorm.registered_domain_col, PSL-lite): a subdomain
    fan-out — a.shop.x.co.uk … z.shop.x.co.uk — shares ONE budget
    instead of minting a fresh per-host budget per vanity subdomain,
    which is exactly the bypass wildcard-DNS traps and link farms use
    against per-host politeness (the reference's granularity,
    crawler_twotier.go's per-host maps). Same split contract and
    deterministic (depth ASC, url_norm ASC) cut; the original host
    column survives untouched on both outputs. The domain derivation
    is pure Catalyst riding the same scan — no extra shuffle beyond
    schedule's own."""
    from ..functions.urlnorm import registered_domain_col

    f2 = frontier.withColumnRenamed("host", "_orig_host").withColumn(
        "host", registered_domain_col(F.col("_orig_host"))
    )
    scheduled, deferred = schedule(f2, budget_per_domain, **kwargs)

    def _restore(df: DataFrame) -> DataFrame:
        return df.drop("host").withColumnRenamed("_orig_host", "host")

    return _restore(scheduled), _restore(deferred)


def dispatch_timeline(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    default_delay_ms: int = 1000,
) -> DataFrame:
    """Assign each scheduled URL a concrete dispatch time honoring its
    host's crawl-delay: slot k of host H fires at ``k * delay_ms(H)``
    (ms since window start). ``delay_budgets`` answers *how many* URLs
    a window admits; this answers *when* each one goes — the table a
    partition-parallel fetch stage replays without any runtime rate
    limiter (the batch engine's substitute for the reference's
    token-bucket waits).

    ``delays``: (host, crawl_delay double seconds) from
    ``robots.host_crawl_delays`` — broadcast (≤1 row/host); hosts
    without a row use ``default_delay_ms``. Slot order is the engine's
    deterministic cut rule — (priority DESC,) depth ASC, url_norm ASC,
    the priority term applying when the frontier carries the column.

    Scale shape: one window partitioned BY HOST — per-host sequential
    by definition (a timeline is a total order per host). Feed it the
    politeness-budgeted batch, never the raw frontier: the budget caps
    each host's rows per window, which is exactly what bounds the
    window task. Output: (url_norm, host, depth, slot, fetch_at_ms).
    """
    from pyspark.sql.window import Window

    if delays is not None:
        dm = delays.select(
            "host",
            F.round(F.col("crawl_delay") * 1000).cast("bigint").alias("_dms"),
        )
        fr = frontier.join(F.broadcast(dm), "host", "left")
    else:
        fr = frontier.withColumn("_dms", F.lit(None).cast("bigint"))
    order = [F.col("depth").asc(), F.col("url_norm").asc()]
    if "priority" in frontier.columns:
        order = [F.col("priority").desc(), *order]
    w = Window.partitionBy("host").orderBy(*order)
    slot = (F.row_number().over(w) - 1).cast("bigint")
    return fr.select(
        "url_norm",
        "host",
        "depth",
        slot.alias("slot"),
        (slot * F.coalesce(F.col("_dms"), F.lit(int(default_delay_ms))))
        .cast("bigint")
        .alias("fetch_at_ms"),
    )
