"""Golden tests for the URL scalar semantics (SURVEY.md §2.2)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions import urlnorm as U


# P1 — utils/utils.go:14-18: strip fragment+query, lowercase EVERYTHING
@pytest.mark.parametrize(
    "url,expected",
    [
        ("https://Example.COM/Path/To?q=1#frag", "https://example.com/path/to"),
        ("HTTPS://HOST.X/PAGE", "https://host.x/page"),
        ("https://h.x/p?", "https://h.x/p"),
        ("https://h.x/p#", "https://h.x/p"),
        ("https://h.x/", "https://h.x/"),
        ("https://h.x", "https://h.x"),
        # naive-concat garbage must round-trip unchanged (lowercased)
        (
            "https://q.example/a/HTTPS://Q.EXAMPLE/UPPER",
            "https://q.example/a/https://q.example/upper",
        ),
    ],
)
def test_normalize_compat_golden(url, expected):
    assert U.normalize_url_compat_py(url) == expected


# RFC 3986 canonicalizer (north_rule)
@pytest.mark.parametrize(
    "url,expected",
    [
        ("HTTPS://Host.X:443/A/B?b=2&a=1#f", "https://host.x/A/B?a=1&b=2"),
        ("http://h.x:80/p", "http://h.x/p"),
        ("http://h.x:8080/p", "http://h.x:8080/p"),
        ("https://h.x", "https://h.x/"),
        ("https://h.x/a/./b/../c", "https://h.x/a/c"),
        ("https://h.x/p?z&y&x", "https://h.x/p?x&y&z"),
    ],
)
def test_canonicalize_rfc3986_golden(url, expected):
    assert U.canonicalize_rfc3986_py(url) == expected


# P3 — tokenizer/fastpath.go:109-127 verbatim quirks
BASE = ("https://h.x/a/b", "https", "h.x")
BASE_SLASH = ("https://h.x/a/", "https", "h.x")


@pytest.mark.parametrize(
    "raw,base,expected",
    [
        ("https://o.x/p", BASE, "https://o.x/p"),
        ("http://o.x/p", BASE, "http://o.x/p"),
        ("https:/weird", BASE, "https:/weird"),  # the 7-byte prefix quirk :110
        ("HTTPS://O.X/P", BASE, "https://h.x/a/b/HTTPS://O.X/P"),  # case-sensitive!
        ("http://", BASE, "https://h.x/a/b/http://"),  # len==7 falls through
        ("//cdn.x/j", BASE, "https://cdn.x/j"),
        ("//", BASE, "https://h.x//"),  # len==2 not >2 -> root-relative branch
        ("/root", BASE, "https://h.x/root"),
        ("rel", BASE, "https://h.x/a/b/rel"),  # naive concat, keeps last segment
        ("rel", BASE_SLASH, "https://h.x/a/rel"),
    ],
)
def test_make_absolute_fast_golden(raw, base, expected):
    assert U.make_absolute_fast_py(raw, *base) == expected


# P2 vs P3 divergence (SURVEY §7 risk 3)
def test_resolver_divergence():
    assert U.resolve_rfc3986_py("rel", "https://h.x/a/b") == "https://h.x/a/rel"
    assert U.make_absolute_fast_py("rel", *BASE) == "https://h.x/a/b/rel"


# P5 vs P6 divergence — utils/utils.go:21-31 vs tokenizer/slowpath.go:135-143
@pytest.mark.parametrize(
    "url,p5,p6",
    [
        ("https://h.x/a.pdf", True, True),
        ("https://h.x/A.PDF", True, True),
        ("https://h.x/a.pdf?x=1", True, False),
        ("https://h.x/a.pdf&y", True, False),
        ("https://h.x/a.pdfx", False, False),
        ("https://h.x/a.txt", False, False),
    ],
)
def test_document_predicates(url, p5, p6):
    assert U.is_document_url_py(url) is p5
    assert U.is_document_slow_py(url) is p6


# P7 — tokenizer/slowpath.go:146-157
@pytest.mark.parametrize(
    "url,ext",
    [
        ("https://h.x/a.pdf", ".pdf"),
        ("https://h.x/a.PDF", ".PDF"),  # case preserved
        ("https://h.x/a.pdf?x=1", ".pdf"),
        ("https://h.x/a", ".x/a"),  # host dot counts — reference quirk
        ("no-dots", ""),
        ("https://h.x/a.b.c", ".c"),
    ],
)
def test_get_extension(url, ext):
    assert U.get_extension_py(url) == ext


# P9 — utils/utils.go:60-69
def test_sanitize_filename():
    assert U.sanitize_filename_py('a\\/:*?"<>|b') == "a_________b"
    long = "x" * 250 + ".pdf"
    out = U.sanitize_filename_py(long)
    assert len(out) == 200 and out.endswith(".pdf")


# Catalyst column expressions must agree with the UDF cores on every
# URL shape the corpora produce (the frontier loop runs the col exprs)
def test_col_expr_equiv_udf(spark):
    urls = [
        "https://host0.example/page/0",
        "https://HOST5.Example/PAGE/5",
        "https://host1.example/page/1?b=2&a=1",
        "https://host2.example/page/2#frag",
        "https://quirk.example/a/rel2",
        "https://quirk.example/a/HTTPS://QUIRK.EXAMPLE/UPPER",
        "https://quirk.example/q?b=2&a=1#sec",
        "https://h.x/docs/file.pdf?x=1",
        "https://h.x",
        "https://h.x/",
        "mailto:x@y.z",
        "not a url",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        U.normalize_url_compat_col(F.col("url")).alias("n_col"),
        U.host_of_col(F.col("url")).alias("h_col"),
    ).collect()
    for u, r in zip(urls, got):
        assert r["n_col"] == U.normalize_url_compat_py(u), u
        assert r["h_col"] == (U.host_of_py(u) or ""), u


def test_pandas_udfs_run(spark):
    df = spark.createDataFrame(
        [("https://A.B/C?x#y",), (None,)], "url string"
    )
    rows = df.select(
        U.normalize_url_compat("url").alias("n"),
        U.canonicalize_rfc3986("url").alias("c"),
        U.host_of("url").alias("h"),
    ).collect()
    assert rows[0]["n"] == "https://a.b/c"
    assert rows[0]["c"] == "https://a.b/C?x"
    assert rows[0]["h"] == "A.B"
    assert rows[1]["n"] is None


def test_registered_domain_col(spark):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.urlnorm import (
        registered_domain_col,
    )
    from pyspark.sql import functions as F

    cases = {
        "a.shop.example.co.uk": "example.co.uk",
        "WWW.Example.CO.UK": "example.co.uk",
        "cdn.example.com": "example.com",
        "example.com": "example.com",
        "deep.a.b.example.com.au": "example.com.au",
        "localhost": "localhost",
        "10.0.3.1": "10.0.3.1",  # IPv4 literal passes through
        "co.uk": "co.uk",  # bare suffix: <=2 labels pass through
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r.host: r.domain
        for r in df.select(
            "host", registered_domain_col(F.col("host")).alias("domain")
        ).collect()
    }
    assert got == cases
