"""URL normalization / resolution semantics.

Two normalizers exist on purpose (SURVEY.md §1.3):

* ``normalize_url_compat`` — the *reference-compatibility* rule from
  ``utils/utils.go:14-18`` (NormalizeParsedURL): drop fragment, drop
  query, re-serialize, lowercase the WHOLE string (scheme, host, path).
  This is the crawl-seen dedup key, needed for URL-seen-set equality
  with the reference.
* ``canonicalize_rfc3986`` — the engine-native canonicalizer the
  north_rule asks for: RFC 3986 (scheme/host lowercased, default port
  stripped, empty path -> "/", dot-segments removed), fragment
  stripped, query parameters byte-sorted.

Two *resolvers* also exist on purpose (SURVEY.md §7 risk 3):

* ``resolve_rfc3986`` — slow-path resolution, ``baseURL.Parse(href)``
  at ``tokenizer/slowpath.go:94-97`` (full RFC 3986 reference
  resolution).
* ``make_absolute_fast`` — fast-path resolution, the deliberately
  non-RFC ``makeAbsolute`` at ``tokenizer/fastpath.go:109-127``
  (naive concat for bare-relative hrefs; quirky ``https:/`` 7-byte
  prefix test). The two paths yield DIFFERENT absolute URLs for the
  same relative href; routing (functions/routing.py) decides which
  applies, so both must be preserved bit-for-bit.

All pure-Python cores here are shared by the pandas UDFs AND the
single-threaded reference-semantics oracle in tests — the Spark plan
and the oracle literally execute the same scalar function, so any
mismatch is in the *dataflow*, which is what the tests target.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# pure scalar cores
# ---------------------------------------------------------------------------


def normalize_url_compat_py(url: str | None) -> str | None:
    """Reference dedup key: utils/utils.go:14-18.

    Fragment := "", RawQuery := "", then lowercase the entire
    re-serialized URL. Returns None for unparseable input (the
    reference drops those rows upstream, crawler_twotier.go:187-190).
    """
    if url is None:
        return None
    try:
        p = urlsplit(url)
    except ValueError:
        return None
    return urlunsplit((p.scheme, p.netloc, p.path, "", "")).lower()


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash semantics of '.'/'..' terminated paths
    if path.endswith(("/.", "/..")) and out and out[-1] != "":
        out.append("")
    return "/".join(out)


def canonicalize_rfc3986_py(url: str | None) -> str | None:
    """Engine-native canonical form (north_rule).

    lowercase scheme+host, strip default port, strip fragment, sort
    query params bytewise (no decode/re-encode round-trip: stable and
    reversible), empty path -> '/', dot-segments removed.
    """
    if url is None:
        return None
    try:
        p = urlsplit(url)
    except ValueError:
        return None
    scheme = p.scheme.lower()
    host = (p.hostname or "").lower()
    port = p.port
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    userinfo = ""
    if p.username:
        userinfo = p.username + (f":{p.password}" if p.password else "") + "@"
    path = _remove_dot_segments(p.path) if p.path else ""
    if not path and host:
        path = "/"
    query = "&".join(sorted(p.query.split("&"))) if p.query else ""
    return urlunsplit((scheme, userinfo + host, path, query, ""))


def make_absolute_fast_py(raw: str, base_str: str, base_scheme: str, base_host: str) -> str:
    """Fast-path makeAbsolute, tokenizer/fastpath.go:109-127, verbatim.

    Quirks preserved: the 7-byte prefix test accepts ``https:/x``
    (fastpath.go:110); bare-relative hrefs are naive-concatenated onto
    the FULL base URL without dropping its last path segment
    (fastpath.go:122-126) — this differs from RFC 3986 resolution.
    """
    if len(raw) > 7 and (raw[:7] == "http://" or raw[:7] == "https:/"):
        return raw
    if len(raw) > 2 and raw[:2] == "//":
        return base_scheme + ":" + raw
    if len(raw) > 0 and raw[0] == "/":
        return base_scheme + "://" + base_host + raw
    if base_str and base_str[-1] == "/":
        return base_str + raw
    return base_str + "/" + raw


def resolve_rfc3986_py(raw: str, base_str: str) -> str | None:
    """Slow-path resolution, tokenizer/slowpath.go:94-97 (url.Parse)."""
    try:
        return urljoin(base_str, raw)
    except ValueError:
        return None


def host_of_py(url: str | None) -> str | None:
    """netloc for the F2 host-present filter (crawler_twotier.go:187-190)
    and for per-host politeness partitioning."""
    if url is None:
        return None
    try:
        return urlsplit(url).netloc
    except ValueError:
        return None


def is_document_url_py(url: str, extensions: tuple[str, ...] = (".pdf",)) -> bool:
    """P5 IsDocumentURL, utils/utils.go:21-31: suffix OR '<ext>?' OR '<ext>&'."""
    low = url.lower()
    return any(low.endswith(e) or (e + "?") in low or (e + "&") in low for e in extensions)


def is_document_slow_py(url: str, extensions: tuple[str, ...] = (".pdf",)) -> bool:
    """P6 isDocument, tokenizer/slowpath.go:135-143: suffix ONLY
    (stricter than P5 — the two-tier build uses this one)."""
    low = url.lower()
    return any(low.endswith(e) for e in extensions)


def get_extension_py(url: str) -> str:
    """P7 getExtension, tokenizer/slowpath.go:146-157."""
    parts = url.split(".")
    if len(parts) > 1:
        ext = parts[-1]
        q = ext.find("?")
        if q != -1:
            ext = ext[:q]
        return "." + ext
    return ""


def sanitize_filename_py(name: str) -> str:
    """P9 SanitizeFilename, utils/utils.go:60-69."""
    for ch in ["\\", "/", ":", "*", "?", '"', "<", ">", "|", "\x00"]:
        name = name.replace(ch, "_")
    if len(name) > 200:
        dot = name.rfind(".")
        ext = name[dot:] if dot > 0 else ""
        name = name[: 200 - len(ext)] + ext
    return name


# ---------------------------------------------------------------------------
# vectorized (Arrow-batched) pandas UDFs — no per-row Python UDFs anywhere
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def normalize_url_compat(urls: pd.Series) -> pd.Series:
    return pd.Series([normalize_url_compat_py(u) for u in urls], dtype=object)


@F.pandas_udf(T.StringType())
def canonicalize_rfc3986(urls: pd.Series) -> pd.Series:
    return pd.Series([canonicalize_rfc3986_py(u) for u in urls], dtype=object)


@F.pandas_udf(T.StringType())
def host_of(urls: pd.Series) -> pd.Series:
    return pd.Series([host_of_py(u) for u in urls], dtype=object)


@F.pandas_udf(T.StringType())
def resolve_rfc3986(refs: pd.Series, bases: pd.Series) -> pd.Series:
    """P2 as a column function: RFC 3986 reference resolution
    (tokenizer/slowpath.go:94-97)."""
    return pd.Series(
        [
            resolve_rfc3986_py(r, b) if r is not None and b is not None else None
            for r, b in zip(refs, bases)
        ],
        dtype=object,
    )


# ---------------------------------------------------------------------------
# column-expression variants (pure Catalyst, whole-stage-codegen'd) for the
# URL shapes the synthetic corpus guarantees (no userinfo/ports/escapes).
# Used in hot paths where the UDF's byte-exactness is not required.
# ---------------------------------------------------------------------------


def normalize_url_compat_col(url):
    """Catalyst-only equivalent of P1 for well-formed URLs:
    lower(strip everything from the first '#' or '?')."""
    return F.lower(F.regexp_replace(url, r"[#?].*$", ""))


def host_of_col(url):
    """Catalyst-only netloc extraction for scheme://host/... URLs."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)


def is_document_url_col(url, ext: str = ".pdf"):
    """P5 as a Catalyst expression (utils/utils.go:21-31)."""
    e = ext.replace(".", r"\.")
    return F.lower(url).rlike(f"{e}($|[?&])")


def is_document_slow_col(url, ext: str = ".pdf"):
    """P6 as a Catalyst expression (tokenizer/slowpath.go:135-143)."""
    return F.lower(url).endswith(ext)


def get_extension_col(url):
    """P7 as a Catalyst expression (tokenizer/slowpath.go:146-157)."""
    last = F.element_at(F.split(url, r"\."), -1)
    stripped = F.element_at(F.split(last, r"\?"), 1)
    return F.when(F.size(F.split(url, r"\.")) > 1, F.concat(F.lit("."), stripped)).otherwise(
        F.lit("")
    )


# multi-label public suffixes a crawler budget-groups under (PSL-lite:
# the high-traffic two-label suffixes; the full Mozilla list is a data
# file swap, the grouping algebra is identical)
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
)


def registered_domain_col(host):
    """The registered (pay-level) domain of a host — the granularity
    production crawlers group politeness budgets and dedup stats
    under: `a.shop.example.co.uk` and `b.example.co.uk` are ONE
    crawl-budget principal, which per-host budgeting (the reference's
    granularity, crawler_twotier.go's per-host maps) cannot see.
    Last-two labels, or last-three when the last-two form a known
    multi-label public suffix (MULTI_SUFFIXES — PSL-lite); hosts with
    <= 2 labels (and bare/degenerate names) pass through unchanged.
    Pure Catalyst — rides any scan, no shuffle, no UDF."""
    host = F.lower(host)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    is_multi = last2.isin(*MULTI_SUFFIXES)
    return (
        F.when(host.rlike(r"^[0-9.]+$"), host)  # IPv4 literals pass through
        .when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )
