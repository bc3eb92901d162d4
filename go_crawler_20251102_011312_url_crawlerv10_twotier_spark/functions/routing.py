"""Two-tier routing — the reference's headline feature (O1).

``Coordinator.Decide`` (tokenizer/coordinator.go:42-99) is a pure
function of ``(url, body_size)``; its seven ordered rules become one
deterministic Catalyst CASE expression — evaluation order must match
the Go rule order exactly, because the rules overlap (e.g. a 50 KB
page at ``/research/x`` is SLOW by rule 2 before rule 4 could claim
it FAST).

Encoding the route as a *column* (instead of the reference's control
flow) is what lets Catalyst keep both paths in one scan: the extract
stage computes fast links for ``path='fast'`` rows and the slow struct
for ``path='slow'`` rows over a single pass of the pages table
(the reference needed hand-merged OnHTML handlers to get the same
effect — FIXES_IMPLEMENTED.md:28-33).
"""

from __future__ import annotations

from urllib.parse import urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

FAST, SLOW = "fast", "slow"

# thresholds: tokenizer/coordinator.go:36-37
FAST_SIZE_LIMIT = 100 * 1024
SLOW_SIZE_LIMIT = 500 * 1024

# keyword lists: tokenizer/coordinator.go:55-61 (slow), :79-87 (fast)
SLOW_KEYWORDS = ("/document", "/paper", "/publication", "/research", "/library")
FAST_KEYWORDS = ("/sitemap", "/archive", "/category", "/tag", "/index", "/list")


def route_decide_py(
    url: str,
    body_size: int,
    fast_limit: int = FAST_SIZE_LIMIT,
    slow_limit: int = SLOW_SIZE_LIMIT,
) -> str:
    """Scalar core of Decide (tokenizer/coordinator.go:42-99); shared
    with the reference-semantics oracle in tests."""
    low = url.lower()
    if body_size > slow_limit:  # :49-52
        return SLOW
    if any(k in low for k in SLOW_KEYWORDS):  # :55-61
        return SLOW
    p = urlsplit(url)
    if p.query != "":  # :65-68
        return SLOW
    if body_size < fast_limit:  # :73-76
        return FAST
    if any(k in low for k in FAST_KEYWORDS):  # :79-87
        return FAST
    if len(p.path.split("/")) <= 3:  # :90-94
        return FAST
    return SLOW  # :97-98


def _contains_any(col: Column, keywords: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for k in keywords:
        cond = cond | col.contains(k)
    return cond


def url_query_col(url) -> Column:
    """RawQuery equivalent: text between the first '?' and '#' (or end)."""
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def url_path_col(url) -> Column:
    """url.Path equivalent for scheme://host/... URLs: text after the
    authority, before '?'/'#'."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def route_decision_col(
    url,
    body_size,
    fast_limit: int = FAST_SIZE_LIMIT,
    slow_limit: int = SLOW_SIZE_LIMIT,
) -> Column:
    """Decide as a single whole-stage-codegen'd CASE expression.

    Rule order mirrors tokenizer/coordinator.go:42-99 one-for-one.
    """
    url = F.col(url) if isinstance(url, str) else url
    body_size = F.col(body_size) if isinstance(body_size, str) else body_size
    low = F.lower(url)
    path_parts = F.size(F.split(url_path_col(url), "/", -1))
    return (
        F.when(body_size > F.lit(slow_limit), F.lit(SLOW))  # rule 1 :49
        .when(_contains_any(low, SLOW_KEYWORDS), F.lit(SLOW))  # rule 2 :55
        .when(url_query_col(url) != "", F.lit(SLOW))  # rule 3 :65
        .when(body_size < F.lit(fast_limit), F.lit(FAST))  # rule 4 :73
        .when(_contains_any(low, FAST_KEYWORDS), F.lit(FAST))  # rule 5 :79
        .when(path_parts <= 3, F.lit(FAST))  # rule 6 :90
        .otherwise(F.lit(SLOW))  # default :97
    )
