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


def dust_param_stats(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_urls: int = 6,
    irrelevance_pct: int = 90,
) -> DataFrame:
    """DUST-style query-parameter mining (Bar-Yossef et al. 2007,
    "Do Not Crawl in the DUST"): learn, per (host, parameter), whether
    the parameter changes content — a content-irrelevant parameter
    (session ids, tracking tags, affiliate codes) multiplies every
    page into an unbounded URL family, and stripping it in the
    canonicalizer collapses the family BEFORE the seen-set probe.
    This is the learned complement to P1's static normalization
    (urlnorm strips what the reference strips; this discovers what
    else is strippable on this corpus).

    Method, self-join-free: for every fetched (url, fingerprint) pair
    and every parameter ``p`` the url carries, bucket the url by
    (everything except p) = base path + the OTHER parameters,
    canonically sorted. Within a bucket, urls differ only in p. If p
    is content-irrelevant, each bucket holds ONE distinct fingerprint;
    if p drives content, distinct fingerprints ≈ urls. Rolled up per
    (host, param):

    ``irrelevant`` ⇔ buckets actually varied (n_urls > n_groups) AND
    ``100*(n_urls - n_contents) >= pct*(n_urls - n_groups)`` — the
    observed fingerprint collapse is >= pct of the maximum possible
    collapse. Integer arithmetic throughout; duplicate fetches of the
    same url collapse via an initial distinct so re-crawls cannot
    inflate the evidence.

    Scale shape: distinct (shuffle 1), a params-per-url explode
    (bounded fan-out — urls carry few parameters), then two
    map-side-partialed aggregations (bucket, then (host, param)).
    Never pairs urls against each other.

    Output: ``(host, param, n_urls, n_groups, n_contents,
    irrelevant)`` for params observed on >= ``min_urls`` urls.
    """
    u = F.col(url_col)
    rows = pages.select(
        u.alias("url"), F.md5(F.col(text_col)).alias("fp")
    ).distinct()
    host = F.regexp_extract("url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    base = F.regexp_replace("url", r"\?[^#]*", "")
    query = F.regexp_extract("url", r"\?([^#]*)", 1)
    params = F.split(query, "&")
    ex = (
        rows.select(
            "fp",
            host.alias("host"),
            base.alias("base"),
            params.alias("params"),
            F.posexplode(params).alias("pos", "kv"),
        )
        .filter(F.col("kv") != "")
        .select(
            "fp",
            "host",
            F.split("kv", "=").getItem(0).alias("param"),
            F.concat(
                F.col("base"),
                F.lit("?"),
                F.array_join(
                    F.array_sort(
                        F.concat(
                            F.slice(F.col("params"), F.lit(1), F.col("pos")),
                            F.slice(
                                F.col("params"),
                                F.col("pos") + F.lit(2),
                                F.size("params") - F.col("pos") - F.lit(1),
                            ),
                        )
                    ),
                    "&",
                ),
            ).alias("bucket"),
        )
    )
    grp = ex.groupBy("host", "param", "bucket").agg(
        F.count("*").alias("n_u"), F.countDistinct("fp").alias("n_f")
    )
    out = grp.groupBy("host", "param").agg(
        F.sum("n_u").cast("bigint").alias("n_urls"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("n_f").cast("bigint").alias("n_contents"),
    )
    return out.filter(F.col("n_urls") >= F.lit(min_urls)).select(
        "host",
        "param",
        "n_urls",
        "n_groups",
        "n_contents",
        (
            (F.col("n_urls") > F.col("n_groups"))
            & (
                (F.col("n_urls") - F.col("n_contents")) * 100
                >= F.lit(irrelevance_pct) * (F.col("n_urls") - F.col("n_groups"))
            )
        ).alias("irrelevant"),
    )


def strip_learned_params(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Apply learned DUST rules: rewrite each url with its host's
    content-irrelevant parameters removed and the survivors sorted
    canonically — the composition step that turns dust_param_stats'
    evidence into frontier collapse (a session-id family of 10^6 urls
    becomes ONE seen-set key). This is the learned extension of P1's
    static canonicalization (urlnorm.canonicalize sorts params; this
    decides which params deserve to exist at all).

    ``rules`` is dust_param_stats' output (or any (host, param,
    irrelevant) table). The rule table rolls up to one array row per
    host and broadcast-joins onto the urls — per-host param lists are
    tiny by construction; the url side never shuffles. Hosts without
    rules pass through (params kept, still sorted). Urls without a
    query keep their base unchanged.

    Output: one row per input row, ``(url, url_canon)``.
    """
    bad = (
        rules.filter(F.col("irrelevant"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("bad_params"))
    )
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    base = F.regexp_replace(u, r"\?[^#]*", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.when(query == "", F.array().cast("array<string>")).otherwise(
        F.split(query, "&")
    )
    withr = urls.withColumn("_h", host).join(
        F.broadcast(bad).withColumnRenamed("host", "_h"), "_h", "left"
    )
    kept = F.filter(
        params,
        lambda kv: ~F.coalesce(
            F.array_contains(F.col("bad_params"), F.split(kv, "=").getItem(0)),
            F.lit(False),
        ),
    )
    canon = F.when(
        F.size(kept) > 0,
        F.concat(base, F.lit("?"), F.array_join(F.array_sort(kept), "&")),
    ).otherwise(base)
    return withr.select(u.alias("url"), canon.alias("url_canon"))


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


# --- soft-404 detection ----------------------------------------------------

# Error-page phrasing that leaks through a 200 status. One alternation,
# RE2-compatible, shared verbatim with the DuckDB oracle.
SOFT404_PATTERN = (
    "(page not found|error 404|404 not found|404 error"
    "|does not exist|no longer available|nothing here)"
)
# Genuine articles QUOTE error phrasing; real soft-404 bodies are short.
SOFT404_MAX_WORDS = 80


def soft404_flags(
    pages: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Flag 200-status pages whose *content* is an error page.

    The reference's F5 gate (downloader/downloader.go:200) only sees the
    status code, so a server that answers 200 with a "Page not found"
    body poisons the corpus and — worse — its outlinks keep feeding the
    frontier. Classification: an error phrase in the lowercased text AND
    a body under ``SOFT404_MAX_WORDS`` whitespace tokens (long pages
    merely *mentioning* errors stay clean). Pure Catalyst (rlike +
    split), map-only, zero shuffle — rides the corpus scan.

    Output: (id, n_words, phrase_hit, soft404) — all non-null: NULL
    text is coalesced to '' up front (as search/curation do), so
    consumers treating soft404 as a boolean never see a third value.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(txt)
    trimmed = F.trim(txt)
    n_words = F.when(trimmed == "", 0).otherwise(F.size(F.split(trimmed, r"\s+")))
    phrase = low.rlike(SOFT404_PATTERN)
    return pages.select(
        F.col(id_col).alias("id"),
        n_words.cast("bigint").alias("n_words"),
        phrase.alias("phrase_hit"),
        (phrase & (n_words <= F.lit(SOFT404_MAX_WORDS))).alias("soft404"),
    )
