"""robots.txt rules (north_rule requirement; engine-native addition).

The reference deliberately DISABLES robots handling
(colly.IgnoreRobotsTxt(), crawler/crawler.go:53 and
crawler_twotier.go:56), so reference-equivalence runs keep
``CrawlConfig.respect_robots=False``. The north_rule nevertheless
mandates robots enforcement in the new engine; this module provides it
Spark-first:

* robots documents live IN the corpus (url ``https://host/robots.txt``
  — the synthetic corpus is the web, SURVEY.md §2.1 S2);
* rule extraction is a scan + projection over those rows;
* enforcement is a broadcast join of the (tiny) per-host rule table
  onto the frontier plus one vectorized verdict UDF — no shuffle of
  the frontier, usable inside every scheduling iteration.

Semantics: the RFC 9309 longest-match subset for ``User-agent: *``
groups — ``Allow:``/``Disallow:`` prefix rules with ``*`` wildcards
and ``$`` end-anchor, longest-pattern-wins, Allow wins ties, empty
Disallow means allow-all, hosts without robots.txt allow everything.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# scalar core (shared with tests/oracle)
# ---------------------------------------------------------------------------


def parse_robots_py(text: str | bytes | None) -> list[tuple[bool, str]]:
    """Parse robots.txt into [(allow, pattern)] for the ``*`` agent.

    Groups: consecutive ``User-agent:`` lines open a group; rules apply
    to every agent named above them. Only ``*`` groups are kept (the
    engine crawls as a generic agent). Unknown directives ignored.
    """
    if text is None:
        return []
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    rules: list[tuple[bool, str]] = []
    in_star_group = False
    seen_agent_line = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_agent_line:
                # consecutive user-agent lines extend the same group
                in_star_group = in_star_group or val == "*"
            else:
                in_star_group = val == "*"
            seen_agent_line = True
        elif key in ("allow", "disallow"):
            seen_agent_line = False
            if in_star_group and val:
                rules.append((key == "allow", val))
            elif in_star_group and key == "disallow" and not val:
                pass  # empty Disallow = allow all (no rule needed)
        else:
            seen_agent_line = False
    return rules


def parse_crawl_delay_py(text: str | bytes | None) -> float | None:
    """``Crawl-delay`` (seconds) for the ``*`` agent group, or None.

    Not part of RFC 9309 but honored by most large crawlers; the last
    valid value in a ``*`` group wins (mirrors parse_robots_py's group
    handling). Non-numeric and negative values are ignored.
    """
    if text is None:
        return None
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    delay: float | None = None
    in_star_group = False
    seen_agent_line = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_agent_line:
                in_star_group = in_star_group or val == "*"
            else:
                in_star_group = val == "*"
            seen_agent_line = True
        else:
            seen_agent_line = False
            if key == "crawl-delay" and in_star_group:
                try:
                    v = float(val)
                except ValueError:
                    continue
                if v >= 0:
                    delay = v
    return delay


def _pattern_to_regex(pattern: str) -> str:
    """RFC 9309 pattern -> anchored regex: '*' = any run, '$' = end."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in core)
    return "^" + rx + ("$" if anchored else "")


def robots_allowed_py(path: str, rules: list[tuple[bool, str]]) -> bool:
    """Longest-match verdict: the rule with the longest pattern that
    matches the path wins; Allow wins length ties; no match => allow."""
    if not rules:
        return True
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if re.match(_pattern_to_regex(pattern), path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len = plen
                best_allow = allow
    return best_allow


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------

RULES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("allow", T.BooleanType()),
            T.StructField("pattern", T.StringType()),
        ]
    )
)


@F.pandas_udf(RULES_TYPE)
def parse_robots(body: pd.Series) -> pd.Series:
    return pd.Series(
        [
            [{"allow": a, "pattern": p} for a, p in parse_robots_py(b)]
            if b is not None
            else []
            for b in body
        ],
        dtype=object,
    )


def robots_rules(
    corpus: DataFrame, url_col: str = "url_norm", body_col: str = "html"
) -> DataFrame:
    """Per-host rule table from the corpus' /robots.txt rows.

    Output: (host, rules). Tiny (one row per host) — broadcast it.
    """
    robots = corpus.filter(F.col(url_col).rlike(r"^https?://[^/]+/robots\.txt$"))
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)/", 1)
    return robots.select(
        host.alias("host"),
        parse_robots(F.col(body_col).cast("string")).alias("rules"),
    )


def host_crawl_delays(
    corpus: DataFrame, url_col: str = "url_norm", body_col: str = "html"
) -> DataFrame:
    """Per-host ``Crawl-delay`` table from the corpus' /robots.txt rows.

    Output: (host, crawl_delay double) — hosts whose robots.txt sets no
    delay are omitted. Tiny (≤ one row per host) — broadcast it.
    """

    @F.pandas_udf("double")
    def delay_of(body: pd.Series) -> pd.Series:
        return pd.Series(
            [parse_crawl_delay_py(b) for b in body], dtype="float64"
        )

    robots = corpus.filter(F.col(url_col).rlike(r"^https?://[^/]+/robots\.txt$"))
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)/", 1)
    return (
        robots.select(
            host.alias("host"),
            delay_of(F.col(body_col).cast("string")).alias("crawl_delay"),
        )
        .filter(F.col("crawl_delay").isNotNull())
    )


def delay_budgets(
    delays: DataFrame, window_s: float, cap: int | None = None
) -> DataFrame:
    """Convert per-host crawl delays into per-iteration politeness
    budgets: one frontier iteration models a ``window_s``-second
    scheduling window, so a host asking for one request per
    ``crawl_delay`` seconds gets ``max(1, floor(window_s/delay))``
    slots in it (delay 0 = uncapped ⇒ NULL budget row dropped;
    ``cap`` bounds hosts with tiny delays).

    Output: (host, budget int) — feed to
    ``politeness.schedule(host_budgets=...)``.
    """
    b = F.floor(F.lit(float(window_s)) / F.col("crawl_delay"))
    if cap is not None:
        b = F.least(b, F.lit(int(cap)))
    return (
        delays.filter(F.col("crawl_delay") > 0)
        .select("host", F.greatest(b, F.lit(1)).cast("int").alias("budget"))
    )


def filter_allowed(
    frontier: DataFrame, rules: DataFrame, host_col: str = "host", url_col: str = "url_norm"
) -> DataFrame:
    """Drop frontier rows a host's robots rules disallow.

    Broadcast join on host (rule table is one row per host), then one
    Arrow-batched verdict over (path, rules). Hosts without rules pass.
    """
    path = F.regexp_extract(F.col(url_col), r"^https?://[^/]+(/.*)?$", 1)

    @F.pandas_udf("boolean")
    def verdict(paths: pd.Series, rule_lists: pd.Series) -> pd.Series:
        out = []
        for p, rl in zip(paths, rule_lists):
            if rl is None or len(rl) == 0:
                out.append(True)
            else:
                rules_py = [(r["allow"], r["pattern"]) for r in rl]
                out.append(robots_allowed_py(p if p else "/", rules_py))
        return pd.Series(out)

    joined = frontier.join(
        F.broadcast(rules.withColumnRenamed("host", "_rhost")),
        frontier[host_col] == F.col("_rhost"),
        "left",
    )
    return (
        joined.withColumn("_path", path)
        .filter(verdict(F.col("_path"), F.col("rules")))
        .drop("_rhost", "rules", "_path")
    )


def robots_sitemaps(
    corpus: DataFrame, url_col: str = "url_norm", body_col: str = "html"
) -> DataFrame:
    """``Sitemap:`` directive discovery — the missing first hop of the
    discovery chain robots.txt → sitemap index → urlset
    (operators/sitemaps.py ingests what this finds, and
    CrawlConfig.discover_sitemaps merges the result into the seed
    frontier). Per the robots.txt spec the directive is a non-group
    record: it may appear anywhere in the file, any letter case,
    multiple times, with an absolute URL value.

    Pure Catalyst (the sitemaps.py discipline): one multiline
    case-insensitive ``regexp_extract_all`` + explode; bodies never
    leave the scan stage. Output: distinct ``(host, sitemap_url)``.
    """
    robots = corpus.filter(F.col(url_col).rlike(r"^https?://[^/]+/robots\.txt$"))
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)/", 1)
    maps = F.regexp_extract_all(
        F.col(body_col).cast("string"),
        F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"),
        F.lit(1),
    )
    return (
        robots.select(host.alias("host"), F.explode(maps).alias("sitemap_url"))
        .distinct()
    )


def clean_param_rules(
    corpus: DataFrame, url_col: str = "url_norm", body_col: str = "html"
) -> DataFrame:
    """``Clean-param:`` directive parse (the Yandex robots extension:
    ``Clean-param: p1&p2 /path-prefix``) — the DECLARED twin of the
    learned DUST rules (operators/traps.py dust_param_stats): the site
    itself names its content-irrelevant query parameters, scoped to an
    optional path prefix (missing prefix = whole host). Stripping
    declared params needs no fingerprint evidence at all, so these
    rules apply from the very first fetch of a host.

    Pure Catalyst: one multiline regexp pass per robots file, params
    explode from their ``&`` list. Output: distinct
    ``(host, param, path_prefix)`` with '/' as the whole-host prefix.
    """
    robots = corpus.filter(F.col(url_col).rlike(r"^https?://[^/]+/robots\.txt$"))
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)/", 1)
    lines = F.regexp_extract_all(
        F.col(body_col).cast("string"),
        F.lit(r"(?im)^[ \t]*clean-param[ \t]*:[ \t]*([^\r\n]+)"),
        F.lit(1),
    )
    ex = robots.select(host.alias("host"), F.explode(lines).alias("line"))
    params = F.split(F.regexp_extract(F.col("line"), r"^(\S+)", 1), "&")
    prefix = F.regexp_extract(F.col("line"), r"^\S+[ \t]+(\S+)", 1)
    return (
        ex.select(
            "host",
            F.explode(params).alias("param"),
            F.when(prefix == "", F.lit("/")).otherwise(prefix).alias("path_prefix"),
        )
        .filter(F.col("param") != "")
        .distinct()
    )


def strip_declared_params(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Apply Clean-param rules: rewrite each url with its host's
    declared parameters removed WHERE the url's path starts with the
    rule's prefix; survivors sort canonically (the
    traps.strip_learned_params contract, so declared and learned rules
    compose by chaining the two passes). Rules roll up to one struct
    array per host and broadcast — the url side never shuffles.

    Output: one row per input row, ``(url, url_canon)``.
    """
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("param", "path_prefix")).alias("cp")
    )
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    path = F.regexp_replace(
        F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
        r"[?#].*$",
        "",
    )
    base = F.regexp_replace(u, r"\?[^#]*", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.when(query == "", F.array().cast("array<string>")).otherwise(
        F.split(query, "&")
    )
    withr = urls.withColumn("_h", host).withColumn("_p", path).join(
        F.broadcast(per_host).withColumnRenamed("host", "_h"), "_h", "left"
    )
    kept = F.filter(
        params,
        lambda kv: ~F.coalesce(
            F.exists(
                F.col("cp"),
                lambda s: (F.split(kv, "=").getItem(0) == s["param"])
                & F.col("_p").startswith(s["path_prefix"]),
            ),
            F.lit(False),
        ),
    )
    canon = F.when(
        F.size(kept) > 0,
        F.concat(base, F.lit("?"), F.array_join(F.array_sort(kept), "&")),
    ).otherwise(base)
    return withr.select(u.alias("url"), canon.alias("url_canon"))


# --- RFC 9309 agent-specific group selection --------------------------------


def parse_robots_groups_py(
    text: str | bytes | None,
) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """Parse robots.txt into [(agent_tokens, [(allow, pattern)])] —
    EVERY group, not just ``*``. Consecutive ``User-agent`` lines
    share one group; unknown directives end the agent-line run but
    stay inside the group (RFC 9309 §2.2.1)."""
    if text is None:
        return []
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    collecting_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                if agents:
                    groups.append((agents, rules))
                agents, rules = [], []
                collecting_agents = True
            agents.append(val.lower())
        else:
            collecting_agents = False
            if key in ("allow", "disallow") and val:
                rules.append((key == "allow", val))
    if agents:
        groups.append((agents, rules))
    return groups


def select_agent_rules_py(
    text: str | bytes | None, agent: str
) -> list[tuple[bool, str]]:
    """RFC 9309 §2.2.1 group selection for a crawler product token:
    the group(s) whose user-agent token is the LONGEST
    case-insensitive prefix of ``agent`` win; groups tied on that
    winning token merge; with no named match the ``*`` groups apply;
    with neither, everything is allowed (empty rule list).

    ``select_agent_rules_py(text, '*')`` reduces to the star-group
    semantics of :func:`parse_robots_py` (pytest-pinned)."""
    a = agent.lower()
    groups = parse_robots_groups_py(text)
    best_len = -1
    for tokens, _ in groups:
        for t in tokens:
            if t != "*" and t and a.startswith(t) and len(t) > best_len:
                best_len = len(t)
    rules: list[tuple[bool, str]] = []
    if best_len >= 0:
        for tokens, rs in groups:
            if any(
                t != "*" and len(t) == best_len and a.startswith(t)
                for t in tokens
            ):
                rules.extend(rs)
    else:
        for tokens, rs in groups:
            if "*" in tokens:
                rules.extend(rs)
    return rules


def robots_rules_for_agent(
    corpus: DataFrame,
    agent: str,
    url_col: str = "url_norm",
    body_col: str = "html",
) -> DataFrame:
    """Per-host rule table for a SPECIFIC crawler product token — the
    reference randomizes its User-Agent per request
    (crawler_twotier.go:52-55) and ignores robots entirely; a crawler
    that identifies honestly must obey the group published for its
    own name, which can be stricter OR looser than ``*``. Same
    (host, rules) shape as :func:`robots_rules`, so
    ``filter_allowed`` composes unchanged.
    """

    @F.pandas_udf(RULES_TYPE)
    def parse_for_agent(body: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [
                    {"allow": a, "pattern": p}
                    for a, p in select_agent_rules_py(b, agent)
                ]
                if b is not None
                else []
                for b in body
            ],
            dtype=object,
        )

    robots = corpus.filter(F.col(url_col).rlike(r"^https?://[^/]+/robots\.txt$"))
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)/", 1)
    return robots.select(
        host.alias("host"),
        parse_for_agent(F.col(body_col).cast("string")).alias("rules"),
    )
