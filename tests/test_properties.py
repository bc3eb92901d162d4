"""Property-based tests (hypothesis) for the scalar semantic cores.

No Spark session needed — these pin the pure-python functions that the
Arrow UDFs and the reference-semantics oracle share, so invariants here
hold for the whole dataflow.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.files import (
    format_bytes_py,
    sanitize_filename_py,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.urlnorm import (
    canonicalize_rfc3986_py,
    normalize_url_compat_py,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.robots import (
    parse_robots_py,
    robots_allowed_py,
)

_host = st.from_regex(r"[a-z](?:[a-z0-9-]{0,10}[a-z0-9])?(?:\.[a-z]{2,5}){1,2}", fullmatch=True)
_path = st.from_regex(r"(?:/[A-Za-z0-9._~%-]{0,12}){0,5}/?", fullmatch=True)
_query = st.from_regex(r"(?:[a-z]{1,4}=[A-Za-z0-9]{0,6}&?){0,4}", fullmatch=True)
_frag = st.from_regex(r"[A-Za-z0-9]{0,8}", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HtTpS"]))
    host = draw(_host)
    if draw(st.booleans()):
        host = host.upper()
    path = draw(_path)
    q = draw(_query)
    f = draw(_frag)
    u = f"{scheme}://{host}{path}"
    if q:
        u += "?" + q
    if f:
        u += "#" + f
    return u


@given(urls())
@settings(max_examples=300, deadline=None)
def test_compat_normalizer_idempotent_and_clean(u):
    n = normalize_url_compat_py(u)
    assert n is not None
    assert n == n.lower()
    assert "#" not in n and "?" not in n
    # idempotent: normalizing a normalized URL is a no-op
    assert normalize_url_compat_py(n) == n


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalizer_idempotent(u):
    c = canonicalize_rfc3986_py(u)
    assert c is not None
    assert canonicalize_rfc3986_py(c) == c
    assert "#" not in c
    # scheme and host are lowercase
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    assert rest.split("/", 1)[0] == rest.split("/", 1)[0].lower()


@given(urls(), urls())
@settings(max_examples=200, deadline=None)
def test_canonical_equal_implies_compat_related(a, b):
    """Canonicalization never merges URLs the compat rule separates by
    host/path (it only strips query where compat also strips it)."""
    ca, cb = canonicalize_rfc3986_py(a), canonicalize_rfc3986_py(b)
    if ca == cb:
        na, nb = normalize_url_compat_py(a), normalize_url_compat_py(b)
        # compat may differ in trailing-slash/dot-segments only
        assert na.split("://", 1)[0] == nb.split("://", 1)[0]


@given(st.text(alphabet=string.printable, max_size=300))
@settings(max_examples=300, deadline=None)
def test_sanitize_filename_safe_and_idempotent(name):
    s = sanitize_filename_py(name)
    assert len(s) <= max(len(name), 0) or len(s) <= 200
    for ch in '\\/:*?"<>|\x00':
        assert ch not in s
    assert sanitize_filename_py(s) == s


@given(st.integers(min_value=0, max_value=2**62))
@settings(max_examples=300, deadline=None)
def test_format_bytes_total_function(n):
    out = format_bytes_py(n)
    assert out.endswith("B")
    if n < 1024:
        assert out == f"{n} B"


_robots_text = st.lists(
    st.one_of(
        st.just("User-agent: *"),
        st.just("User-agent: somebot"),
        st.from_regex(r"Disallow: (/[a-z*$]{0,8}){0,3}", fullmatch=True),
        st.from_regex(r"Allow: (/[a-z*$]{0,8}){0,3}", fullmatch=True),
        st.just("Crawl-delay: 5"),
        st.just("# comment"),
        st.just(""),
    ),
    max_size=12,
).map("\n".join)


@given(_robots_text, st.from_regex(r"(/[a-z]{0,6}){0,4}", fullmatch=True))
@settings(max_examples=300, deadline=None)
def test_robots_total_and_empty_allows(txt, path):
    rules = parse_robots_py(txt)
    # verdict is total (never raises) and boolean
    assert robots_allowed_py(path or "/", rules) in (True, False)
    assert robots_allowed_py(path or "/", []) is True
