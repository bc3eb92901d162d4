"""Redirect-chain resolution for the frontier scheduler.

The reference crawler inherits Go ``net/http``'s default redirect
policy through colly: a request transparently follows 3xx chains and
gives up after 10 hops ("stopped after 10 redirects"); only the final
response reaches ``OnResponse`` / the status-200 gate
(downloader/downloader.go:200, crawler/crawler.go:101). In the batch
engine the redirect map is a *table* (src_url -> dst_url, one row per
301/302/307/308 response), and resolution becomes a bounded
pointer-doubling join so a 10^10-row frontier resolves every chain in
O(log max_hops) shuffles of the (much smaller) redirect table — never
one job per hop.

Semantics (exact, loop-safe):

* a request URL that is not a redirect source resolves to itself with
  ``n_hops = 0``;
* a chain that terminates at a non-redirect URL within ``max_hops``
  hops resolves ``ok`` with the exact hop count and final URL;
* anything else — loops, or chains longer than ``max_hops`` — is
  ``stuck`` with NULL final/hops, exactly the class net/http aborts.

Scale notes: the jump table starts as the redirect edge set and is
composed with itself ``ceil(log2(max_hops)) + 1`` times, so reach
strictly exceeds ``max_hops`` and the ok/stuck classification is
exact. Each round is two hash joins keyed on a URL column; the
request table is touched exactly once at the end (one left join).
No driver-side iteration state, no ``collect``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Go net/http defaultCheckRedirect gives up at 10 hops.
MAX_HOPS = 10


def _doubling_rounds(max_hops: int) -> int:
    rounds = 0
    reach = 1
    while reach <= max_hops:
        reach *= 2
        rounds += 1
    return rounds


def resolve_redirects(
    requests: DataFrame,
    redirects: DataFrame,
    url_col: str = "url",
    max_hops: int = MAX_HOPS,
) -> DataFrame:
    """Resolve every request URL through the redirect map.

    ``requests``: any DataFrame with ``url_col``.
    ``redirects``: (src, dst) — functional (one dst per src).

    Returns (url, status, final_url, n_hops) with status in
    ('ok', 'stuck'); final_url/n_hops NULL when stuck.
    """
    # The composition tree below references each round's jump table
    # twice, so an UNCACHED jump would be recomputed O(2^rounds) times
    # at action time (measured 14 s on a 5 K-page corpus whose edge
    # extraction sat in the leaves). persist() keeps the plan lazy but
    # collapses execution to one computation per round — total work
    # O(rounds x |redirects|), plan still fixed by max_hops. The final
    # jump table is localCheckpoint'ed (eager, redirect-table-sized)
    # so every intermediate cache can be RELEASED before returning —
    # callers in a loop (crawl, canonical_clusters) would otherwise
    # leak ~6 cached frames per call for the session lifetime.
    # Trade-off (accepted engine-wide, same as host_hits/dsir_resample):
    # eager checkpointing runs the doubling rounds at call time, and
    # localCheckpoint blocks are non-reliable — on executor loss the
    # caller re-calls rather than recomputing lineage. Lazy would
    # defeat the fix: unpersisting the intermediates before the first
    # action re-opens the O(2^rounds) leaf re-execution.
    cached = []
    edges = (
        redirects.select(F.col("src").alias("u"), F.col("dst").alias("cur"))
        .filter(F.col("cur").isNotNull())
        .persist()
    )
    cached.append(edges)
    srcs = edges.select(F.col("u").alias("s")).distinct()

    # jump_0: one hop; done = landed on a non-redirect URL
    jump = (
        edges.join(srcs, edges.cur == srcs.s, "left")
        .select(
            "u",
            "cur",
            F.lit(1).cast("int").alias("hops"),
            F.col("s").isNull().alias("done"),
        )
        .persist()
    )
    cached.append(jump)

    for _ in range(_doubling_rounds(max_hops)):
        finished = jump.filter(F.col("done"))
        active = jump.filter(~F.col("done"))
        # compose: follow the *same* jump table again from the landing
        # point. Every not-done landing point is a redirect source, and
        # the jump table covers every redirect source, so inner join is
        # total on the active rows.
        hop2 = jump.select(
            F.col("u").alias("m"),
            F.col("cur").alias("cur2"),
            F.col("hops").alias("hops2"),
            F.col("done").alias("done2"),
        )
        composed = active.join(hop2, active.cur == hop2.m).select(
            "u",
            F.col("cur2").alias("cur"),
            (F.col("hops") + F.col("hops2")).cast("int").alias("hops"),
            F.col("done2").alias("done"),
        )
        jump = finished.unionByName(composed).persist()
        cached.append(jump)

    # Materialize the final table (one row per redirect src — bounded
    # by the redirect map, never the corpus), then release every
    # intermediate so repeated calls don't accumulate cached frames.
    jump = jump.localCheckpoint()
    for c in cached:
        c.unpersist()

    resolved = jump.select(
        F.col("u").alias("_src"),
        F.col("cur").alias("_final"),
        "hops",
        "done",
    )
    out = requests.join(
        resolved, requests[url_col] == resolved._src, "left"
    )
    is_plain = F.col("_src").isNull()
    is_ok = F.col("done") & (F.col("hops") <= max_hops)
    return out.select(
        F.col(url_col).alias("url"),
        F.when(is_plain | is_ok, F.lit("ok")).otherwise(F.lit("stuck")).alias("status"),
        F.when(is_plain, F.col(url_col))
        .when(is_ok, F.col("_final"))
        .alias("final_url"),
        F.when(is_plain, F.lit(0))
        .when(is_ok, F.col("hops"))
        .cast("int")
        .alias("n_hops"),
    )


# --- rel=canonical clustering ----------------------------------------------

# <link rel="canonical" href="..."> — the attribute-ordered form the
# overwhelming majority of CMSes emit; RE2-safe, shared with the oracle.
CANONICAL_PATTERN = '<link rel="canonical" href="([^"]+)"'


def canonical_clusters(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_hops: int = MAX_HOPS,
) -> DataFrame:
    """Cluster URL variants by their declared rel=canonical target.

    Variant pages (?utm=..., /amp, paginated mirrors) declare a
    canonical URL in <head>; chains (variant -> base -> older base) and
    even canonical LOOPS occur in the wild. The extraction is a
    map-only regexp over the corpus scan; chain-following reuses
    ``resolve_redirects``'s pointer-doubling (canonical edges are just
    another functional URL graph, O(log max_hops) shuffles of the
    edge table). Conflicting chains that loop or run past ``max_hops``
    fall back to self — a crawler ignores an unresolvable canonical
    rather than dropping the page.

    Output, one row per page: (url, canonical_url, is_canonical,
    n_members) — n_members is the cluster size on canonical rows and
    0 elsewhere, attached by joining the cluster counts back on the
    UNIQUE url key (never on the hot canonical key: a mega-cluster's
    count reaches its reducer as map-side partials, and the join back
    matches exactly one row, so no skew path exists in this plan).
    """
    href = F.regexp_extract(F.col(html_col), CANONICAL_PATTERN, 1)
    edges = (
        pages.select(F.col(url_col).alias("src"), href.alias("dst"))
        .filter((F.col("dst") != "") & (F.col("dst") != F.col("src")))
    )
    res = resolve_redirects(pages.select(url_col), edges, url_col, max_hops)
    mapping = res.select(
        "url",
        F.when(F.col("status") == "ok", F.col("final_url"))
        .otherwise(F.col("url"))
        .alias("canonical_url"),
    )
    counts = mapping.groupBy("canonical_url").agg(
        F.count("*").cast("bigint").alias("_n")
    ).select(F.col("canonical_url").alias("_cu"), "_n")
    out = mapping.join(counts, mapping.url == counts._cu, "left").select(
        "url",
        "canonical_url",
        (F.col("url") == F.col("canonical_url")).alias("is_canonical"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_members"),
    )
    return out
