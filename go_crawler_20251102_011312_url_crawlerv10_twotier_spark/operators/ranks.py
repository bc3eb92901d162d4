"""Host-rank producers for the rank-aware scheduler.

The scheduler (operators/politeness.py ``schedule(host_ranks=...)``)
consumes any small (host, host_rank double) table. This module closes
the loop by computing one FROM the corpus itself: in-link counts per
target host — the degree-1 approximation of host centrality every
production crawler starts from (harmonic centrality / PageRank refine
it later; the scheduler contract is identical).

Plan shape: corpus scan → E1 link extract (Arrow UDF) → explode →
host projection → hash aggregate. One shuffle, map-side partials; the
result is hosts-sized (tiny next to the corpus) and is broadcast by
the scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.predicates import host_present
from ..functions.urlnorm import host_of_col
from .extract import extract_links_fast


def host_inlink_ranks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(host, host_rank) where host_rank = number of extracted links
    pointing AT that host across the whole corpus (E1 fast-path
    extraction — the same links the crawl itself would follow)."""
    links = pages.select(
        F.explode(
            extract_links_fast(F.col(html_col), F.col(url_col))
        ).alias("href")
    )
    tgt = links.select(host_of_col(F.col("href")).alias("host")).filter(
        host_present(F.col("host"))
    )
    return tgt.groupBy("host").agg(
        F.count("*").cast("double").alias("host_rank")
    )


def host_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """The host link graph ``(src_host, dst_host)`` extracted from the
    corpus with the same E1 fast path the crawl follows — the input
    :func:`host_pagerank` expects. Duplicate edges are kept here (one
    row per link); ``host_pagerank`` dedupes, so callers can also feed
    this to weighted variants later without re-extracting."""
    links = pages.select(
        host_of_col(F.col(url_col)).alias("src_host"),
        F.explode(
            extract_links_fast(F.col(html_col), F.col(url_col))
        ).alias("href"),
    )
    return links.select(
        "src_host", host_of_col(F.col("href")).alias("dst_host")
    ).filter(host_present(F.col("dst_host")))


def host_reciprocity(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    min_out: int = 2,
    farm_pct: int = 50,
) -> DataFrame:
    """Link-farm signal over the host graph: the fraction of a host's
    distinct out-neighbors that link straight back. Organic linking is
    overwhelmingly asymmetric (a blog links wikipedia; wikipedia does
    not link back), while link-exchange rings reciprocate by
    construction — high reciprocity at non-trivial out-degree is the
    classic farm fingerprint (complements host_pagerank, which farms
    are designed to inflate, and host_trap_stats' URL-shape view).

    Output: ``(host, n_out, n_reciprocal, link_farm)`` with
    ``link_farm`` = n_out >= ``min_out`` AND ``100*n_reciprocal >=
    farm_pct*n_out`` — integer cross-multiply, engine-exact.

    Scale shape: edges dedup to distinct cross-host pairs (one
    shuffle), reciprocation is a LEFT SEMI self-join on the (s, t)
    pair key — output bounded by the edge list, never host-quadratic —
    and two map-side-partial aggs. Self-loops are excluded BEFORE the
    dedup so a host's internal links never count toward either side.
    """
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
        .filter(F.col("s") != F.col("t"))
        .distinct()
    )
    rev = e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    rec = e.join(rev, ["s", "t"], "left_semi")
    n_out = e.groupBy("s").agg(F.count("*").cast("bigint").alias("n_out"))
    n_rec = rec.groupBy("s").agg(
        F.count("*").cast("bigint").alias("n_reciprocal")
    )
    out = n_out.join(n_rec, "s", "left").select(
        F.col("s").alias("host"),
        "n_out",
        F.coalesce(F.col("n_reciprocal"), F.lit(0)).cast("bigint").alias("n_reciprocal"),
    )
    return out.select(
        "host",
        "n_out",
        "n_reciprocal",
        (
            (F.col("n_out") >= F.lit(min_out))
            & (F.col("n_reciprocal") * 100 >= F.lit(farm_pct) * F.col("n_out"))
        ).alias("link_farm"),
    )


def host_pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Synchronized PageRank over the host graph — the iterative
    refinement of :func:`host_inlink_ranks` (same scheduler contract:
    a small ``(host, host_rank double)`` table for
    ``politeness.schedule(host_ranks=...)``).

    Exact semantics (mirrored by the DuckDB gate oracle):

    * nodes ``V`` = distinct(src ∪ dst); ``N = |V|``
    * edges deduplicated to distinct ``(src, dst)`` pairs
    * ``pr_0(v) = 1/N``
    * ``pr_{k+1}(v) = (1-d)/N + d * Σ_{(s,v)∈E} pr_k(s)/outdeg(s)``
    * dangling hosts (no out-edges) keep receiving teleport mass but
      contribute none — their mass leaks, as in the simple formulation
      (documented choice; the redistribution variant adds one scalar
      per iteration and changes no plan shape)

    Scale shape: the edge table is deduped, hash-partitioned on src
    and persisted ONCE; every iteration then shuffles only the
    hosts-sized rank table to the src partitioning (join), aggregates
    contributions with map-side partials (one shuffle of contribution
    rows, grouped by dst), and left-joins back onto the static host
    list. The rank carrier is eagerly cut per iteration so the plan
    stays flat — at 10^8 hosts every structure here is
    hosts/edges-partitioned; nothing is driver-resident or broadcast.
    """
    from pyspark import StorageLevel

    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
        .dropDuplicates(["s", "t"])
        .repartition("s")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hosts = (
        e.select(F.col("s").alias("host"))
        .unionByName(e.select(F.col("t").alias("host")))
        .dropDuplicates(["host"])
        .localCheckpoint(eager=True)
    )
    n = hosts.count()
    outdeg = e.groupBy("s").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)

    ranks = hosts.select("host", F.lit(1.0 / n).alias("pr"))
    for _ in range(n_iters):
        contribs = (
            e.join(outdeg, "s")
            .join(ranks.select(F.col("host").alias("s"), "pr"), "s")
            .select(F.col("t").alias("host"), (F.col("pr") / F.col("deg")).alias("c"))
        )
        inflow = contribs.groupBy("host").agg(F.sum("c").alias("m"))
        ranks = (
            hosts.join(inflow, "host", "left")
            .select(
                "host",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks.select("host", F.col("pr").alias("host_rank"))


def recrawl_change_rates(
    snapshots: DataFrame,
    key_col: str = "url_norm",
    ts_col: str = "warc_ts",
    content_col: str = "content_md5",
) -> DataFrame:
    """Per-URL change statistics from recrawl history — the input a
    production crawler's revisit policy consumes (pages that change
    every fetch get short refetch intervals; static ones get long).

    For each url's versions ordered by ``ts_col``: ``n_versions``,
    ``n_changes`` (versions whose content digest differs from the
    previous version's), and ``change_rate`` = n_changes /
    (n_versions - 1), 0.0 for single-version urls.

    Scale: the lag window partitions by url — per-task state is one
    url's version list (WARC recrawl counts are small by nature), and
    the aggregate that follows reuses the same hash partitioning, so
    the whole operator is ONE shuffle on the url key.
    """
    return _change_stats(snapshots, key_col, ts_col, content_col).drop(
        "_last_ts"
    )


def recrawl_diff(
    prior: DataFrame,
    current: DataFrame,
    key_col: str = "url_norm",
    content_col: str = "content_md5",
) -> DataFrame:
    """Snapshot diff classifier — the recrawl delta router.

    Given the PRIOR crawl's (key, content digest) table and the
    CURRENT one (each one row per key; feed :func:`dedup.latest_snapshot`
    output when a side carries history), classify every key:

    * ``new``       — key absent from prior
    * ``removed``   — key absent from current
    * ``changed``   — present in both, digest differs
    * ``unchanged`` — present in both, digest equal

    This is the gatekeeper of incremental reprocessing
    (`plans.pipeline.run_incremental_pipeline`): only ``new`` +
    ``changed`` keys re-enter the per-document stages; ``unchanged``
    reuse the prior run's outputs; ``removed`` are dropped from the
    merged corpus. The reference crawler has no recrawl loop (its seen
    set is append-only, crawler/crawler_twotier.go:224-245); this is
    the freshness counterpart its visited-URL log implies.

    Scale shape: ONE full-outer shuffle join on the key — both sides
    hash-partition once, no row carries content (digests only), and
    the output is key-sized. At 10^10 URLs this is the same shuffle
    class as the J1 seen anti-join.
    """
    p = prior.select(
        F.col(key_col).alias("_pk"), F.col(content_col).alias("_pc")
    )
    c = current.select(
        F.col(key_col).alias("_ck"), F.col(content_col).alias("_cc")
    )
    j = p.join(c, p["_pk"] == c["_ck"], "full_outer")
    return j.select(
        F.coalesce("_pk", "_ck").alias(key_col),
        F.when(F.col("_pk").isNull(), F.lit("new"))
        .when(F.col("_ck").isNull(), F.lit("removed"))
        .when(F.col("_pc") != F.col("_cc"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )


def _change_stats(
    snapshots: DataFrame, key_col: str, ts_col: str, content_col: str
) -> DataFrame:
    """Shared body of :func:`recrawl_change_rates` /
    :func:`recrawl_schedule` — per-url version/change counts plus the
    url's newest capture ts (``_last_ts``). One shuffle on the url
    key: the lag window and the aggregate reuse the same hash
    partitioning."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    d = snapshots.withColumn("_prev", F.lag(content_col).over(w))
    agg = d.groupBy(key_col).agg(
        F.count("*").cast("int").alias("n_versions"),
        F.sum(
            F.when(
                F.col("_prev").isNotNull() & (F.col("_prev") != F.col(content_col)),
                1,
            ).otherwise(0)
        )
        .cast("int")
        .alias("n_changes"),
        F.max(ts_col).alias("_last_ts"),
    )
    return agg.withColumn(
        "change_rate",
        F.round(
            F.when(
                F.col("n_versions") > 1,
                F.col("n_changes") / (F.col("n_versions") - 1),
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )


def recrawl_schedule(
    snapshots: DataFrame,
    per_host_budget: int = 2,
    key_col: str = "url_norm",
    ts_col: str = "warc_ts",
    content_col: str = "content_md5",
) -> DataFrame:
    """Freshness-driven revisit scheduler: rank every url by its
    expected number of MISSED changes since its last capture and keep
    the ``per_host_budget`` stalest urls per host — the next recrawl
    wave, already respecting the same per-host politeness bound the
    frontier scheduler enforces.

    Exact semantics (twinned by the ``recrawl_schedule`` gate oracle):

    * per-url stats as :func:`recrawl_change_rates`, plus ``last_ts``
      (the url's newest capture)
    * ``now`` = max ts over the WHOLE snapshot table — the batch
      clock is the latest observed capture, never wall-clock, so the
      schedule is deterministic and resumable
    * ``age_s`` = now − last_ts in whole seconds
    * ``staleness`` = change_rate × age_s — the first-order expected
      change count under a Poisson page-change model (the classic
      revisit-policy estimate; pages that change often AND haven't
      been fetched recently float to the top)
    * per-host ``row_number`` over (staleness DESC, url ASC), kept
      while ≤ ``per_host_budget``

    Scale shape: one shuffle on the url key (window + same-key agg),
    one scalar max whose exchange moves a single pre-aggregated row
    per partition (partial→final; the 1-row result is broadcast
    back), and one shuffle on host for the budget window — window
    state is bounded by a host's url count, output by the budget.
    """
    stats = _change_stats(snapshots, key_col, ts_col, content_col)
    now = snapshots.agg(F.max(ts_col).alias("_now"))
    # scalar-subquery attach: PySpark has no scalar-subquery API, so
    # the 1-row clock rides a broadcast cross join — the plan is a
    # BroadcastNestedLoopJoin whose build side is a scalar aggregate,
    # i.e. one row to every task, never a blow-up (a constant-key
    # equi-join folds back to exactly this plan anyway)
    scored = (
        stats.crossJoin(F.broadcast(now))
        .select(
            key_col,
            host_of_col(F.col(key_col)).alias("host"),
            "n_versions",
            "n_changes",
            "change_rate",
            (F.unix_timestamp("_now") - F.unix_timestamp("_last_ts")).alias(
                "age_s"
            ),
        )
        .withColumn("staleness", F.col("change_rate") * F.col("age_s"))
    )
    wh = Window.partitionBy("host").orderBy(
        F.col("staleness").desc(), F.col(key_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(wh)).filter(
        F.col("rank") <= per_host_budget
    )


def host_hits(
    edges: DataFrame,
    n_iters: int = 2,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """HITS hubs & authorities over the host graph (Kleinberg 1999) —
    the directional complement of :func:`host_pagerank`: a link FARM
    pumps hub mass but earns no authority, a heavily-cited archive is
    the reverse. The scheduler reads authority as "worth fetching
    deeply" and hub as "worth mining for outlinks" — two priorities
    one PageRank scalar conflates.

    Exact semantics (mirrored by the unrolled-CTE oracle):

    * edges deduplicated to distinct (src, dst); self-loops kept
    * hub_0(u) = 1.0 on every host
    * per iteration: auth(v) = Σ_{(u,v)} hub(u), L1-normalized over
      all hosts; then hub(u) = Σ_{(u,v)} auth(v), L1-normalized
    * hosts outside a sum coalesce to 0 BEFORE normalization

    Scale shape: identical to host_pagerank — the deduped edge table
    is src-partitioned and persisted once; each half-iteration is one
    hosts-sized join + one map-side-partial aggregation; the L1 total
    is a broadcast 1-row scalar attach (the engine's crossJoin-scalar
    pattern); carriers are eagerly cut per iteration.

    Float caveat (accepted-risk class shared with host_pagerank): the
    L1 totals are IEEE-double sums, so a gate value sitting exactly on
    a round(.,6) boundary could flip vs the oracle at other partition
    counts; if that ever fires, switch hub/auth mass to integer
    micro-units (the bm25_topk pattern).
    """
    from pyspark import StorageLevel

    if n_iters < 1:
        raise ValueError(f"host_hits needs n_iters >= 1, got {n_iters}")

    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
        .dropDuplicates(["s", "t"])
        .repartition("s")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hosts = (
        e.select(F.col("s").alias("host"))
        .unionByName(e.select(F.col("t").alias("host")))
        .dropDuplicates(["host"])
        .localCheckpoint(eager=True)
    )

    def _l1_normalize(scores: DataFrame, col: str) -> DataFrame:
        tot = scores.agg(F.sum(col).alias("_tot"))
        return scores.crossJoin(F.broadcast(tot)).select(
            "host", (F.col(col) / F.col("_tot")).alias(col)
        )

    hub = hosts.select("host", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(n_iters):
        a_raw = (
            e.join(hub.select(F.col("host").alias("s"), "hub"), "s")
            .groupBy(F.col("t").alias("host"))
            .agg(F.sum("hub").alias("x"))
        )
        auth = _l1_normalize(
            hosts.join(a_raw, "host", "left").select(
                "host", F.coalesce("x", F.lit(0.0)).alias("auth")
            ),
            "auth",
        ).localCheckpoint(eager=True)
        h_raw = (
            e.join(auth.select(F.col("host").alias("t"), "auth"), "t")
            .groupBy(F.col("s").alias("host"))
            .agg(F.sum("auth").alias("x"))
        )
        hub = _l1_normalize(
            hosts.join(h_raw, "host", "left").select(
                "host", F.coalesce("x", F.lit(0.0)).alias("hub")
            ),
            "hub",
        ).localCheckpoint(eager=True)
    e.unpersist()
    return hub.join(auth, "host").select("host", "hub", "auth")
