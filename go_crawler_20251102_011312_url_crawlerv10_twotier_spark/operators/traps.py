"""Crawl-trap detection: per-host URL-shape anomaly statistics.

Infinite URL spaces (calendar pages, faceted search, session-id
query strings) are the classic crawler failure mode: one host emits
unbounded novel urls under a handful of path prefixes, and a frontier
without a trap gate spends its politeness budget re-crawling noise.
This operator rolls the frontier's url shapes up per host so the
scheduler can demote or cap suspect hosts — the reference crawler has
no equivalent (its depth cap is the only trap defense); this is the
batch-shaped version of the per-host novelty heuristics production
crawlers run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# first one-or-two path segments: the granularity calendar/facet traps
# concentrate under ((?:...) keeps the regex RE2-compatible for the
# gate oracle)
PREFIX_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^/?#]+(?:/[^/?#]+)?)"


def host_trap_stats(
    urls: DataFrame,
    url_col: str = "url_norm",
    host_col: str = "host",
    min_urls: int = 20,
    share_threshold: float = 0.5,
    query_threshold: float = 0.5,
) -> DataFrame:
    """Per-host URL-shape statistics plus a ``suspect`` flag.

    Output: ``(host, n_urls, n_prefixes, max_prefix_urls, trap_share,
    query_frac, suspect)`` where ``trap_share`` = the largest single
    prefix's share of the host's urls and ``query_frac`` = fraction of
    urls carrying a query string. ``suspect`` = at least ``min_urls``
    urls AND (trap_share ≥ ``share_threshold`` OR query_frac ≥
    ``query_threshold``) — both rates divide exact integer counts, so
    the flag is engine- and partition-order-independent.

    Scale shape: one (host, prefix) aggregation then one host
    aggregation, both map-side-partialed; no row ever carries more
    than the host+prefix strings. Hosts with no path (bare roots) land
    in the '' prefix bucket rather than vanishing.
    """
    pref = F.coalesce(
        F.regexp_extract(F.col(url_col), PREFIX_PATTERN, 1), F.lit("")
    )
    has_q = F.col(url_col).contains("?").cast("long")
    per_prefix = (
        urls.select(
            F.col(host_col).alias("host"),
            pref.alias("prefix"),
            has_q.alias("q"),
        )
        .groupBy("host", "prefix")
        .agg(F.count("*").alias("n"), F.sum("q").alias("nq"))
    )
    per_host = per_prefix.groupBy("host").agg(
        F.sum("n").alias("n_urls"),
        F.count("*").alias("n_prefixes"),
        F.max("n").alias("max_prefix_urls"),
        F.sum("nq").alias("n_query"),
    )
    trap_share = F.col("max_prefix_urls") / F.col("n_urls")
    query_frac = F.col("n_query") / F.col("n_urls")
    return per_host.select(
        "host",
        "n_urls",
        "n_prefixes",
        "max_prefix_urls",
        trap_share.alias("trap_share"),
        query_frac.alias("query_frac"),
        (
            (F.col("n_urls") >= F.lit(min_urls))
            & (
                (trap_share >= F.lit(share_threshold))
                | (query_frac >= F.lit(query_threshold))
            )
        ).alias("suspect"),
    )


def url_features(
    urls: DataFrame,
    url_col: str = "url_norm",
) -> DataFrame:
    """Per-URL shape features — the frontier-prioritization signals
    production crawlers feed their priority queue (host_trap_stats is
    the per-host rollup; this is the per-URL row): path depth, query
    parameter count, digit density, URL length. The composite
    ``shape_score`` (higher = more content-shaped) demotes deep,
    parameter-heavy, digit-dense URLs — calendar/facet/session noise —
    before a politeness slot is spent on them. Use it as a frontier
    filter/threshold directly, or aggregate per host (e.g. mean
    shape_score) into the rank table ``politeness.schedule``'s
    host_ranks input expects.

    All-integer arithmetic (digit density as permille via exact
    integer division) so the score is bit-identical across engines.
    Map-only Catalyst — rides the frontier scan, no shuffle.

    Output: ``(url_norm, path_depth, n_params, digit_permille,
    url_len, shape_score)``.
    """
    u = F.col(url_col)
    # path = segment count after the authority, query/fragment excluded
    path = F.regexp_replace(
        F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
        r"[?#].*$",
        "",
    )
    path_depth = (
        F.length(F.regexp_replace(path, r"[^/]", "")).cast("bigint")
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.length(F.regexp_replace(query, "[^&]", "")) + 1
    ).cast("bigint")
    n_digits = F.length(F.regexp_replace(u, r"[^0-9]", ""))
    url_len = F.length(u).cast("bigint")
    digit_permille = F.floor(
        n_digits * F.lit(1000) / F.greatest(url_len, F.lit(1))
    ).cast("bigint")
    score = (
        F.lit(100)
        - F.lit(10) * path_depth
        - F.lit(5) * n_params
        - F.floor(digit_permille / F.lit(20))
    ).cast("bigint")
    return urls.select(
        u.alias("url_norm"),
        path_depth.alias("path_depth"),
        n_params.alias("n_params"),
        digit_permille.alias("digit_permille"),
        url_len.alias("url_len"),
        score.alias("shape_score"),
    )
