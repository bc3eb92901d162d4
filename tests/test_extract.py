"""E1/E2 extraction — byte-scan and DOM semantics
(tokenizer/fastpath.go:33-127, tokenizer/slowpath.go:57-171)."""

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.extract import (
    analyze_slow_py,
    extract_links_fast_py,
)

BASE = "https://h.x/dir/page"


def fast(html: str) -> list[str]:
    return extract_links_fast_py(html.encode(), BASE)


class TestFastScan:
    def test_quoted_double(self):
        assert fast('<a href="/a">x</a>   ') == ["https://h.x/a"]

    def test_quoted_single(self):
        assert fast("<a href='/a'>x</a>   ") == ["https://h.x/a"]

    def test_unquoted_terminators(self):
        # unquoted ends at space or '>' ONLY (fastpath.go:60)
        assert fast("<a href=/a>x</a>      ") == ["https://h.x/a"]
        assert fast("<a href=/a b>x</a>    ") == ["https://h.x/a"]
        assert fast("<a href=/a\tb></a>    ") == ["https://h.x/a\tb"]  # tab not a terminator

    def test_unquoted_runs_to_end(self):
        # no terminator found: value runs to the end of the bytes
        assert fast("href=/abc") == ["https://h.x/abc"]

    def test_case_insensitive_href(self):
        assert fast('<a HREF="/a">x</a>    ') == ["https://h.x/a"]
        assert fast('<a HrEf="/a">x</a>    ') == ["https://h.x/a"]

    def test_href_anywhere_in_bytes(self):
        # the scan has no notion of tags (fastpath.go:42): text matches too
        assert fast('some text href=/zzz more') == ["https://h.x/zzz"]
        assert fast('<script>var href="/s";</script>   ') == ["https://h.x/s"]

    def test_tail_blindness(self):
        # matches at position >= len-6 are never attempted (fastpath.go:41)
        s = '<a href="/a">'
        # 'href=' at index 3; len=13 -> limit 7; 3 < 7 -> extracted
        assert fast(s) == ["https://h.x/a"]
        # pad so the href= lands within the last 6 bytes
        s2 = "xxxxxxxxxx" + "href=Y"
        assert fast(s2) == []

    def test_skip_rules(self):
        html = (
            '<a href="#frag">a</a><a href="javascript:void(0)">b</a>'
            '<a href="mailto:x@y">c</a><a href="">d</a><a href="/ok">e</a>'
        )
        assert fast(html) == ["https://h.x/ok"]

    def test_value_consumption_skips_inner_href(self):
        # scan resumes after the consumed value: inner 'href=' inside a
        # value is not re-matched
        html = '<a href="a href=b">x</a>      '
        assert fast(html) == ["https://h.x/dir/page/a href=b"]

    def test_empty_input(self):
        assert fast("") == []
        assert fast("short") == []


class TestSlowDom:
    def test_metadata_and_links(self):
        html = """<html><head><title>My Title</title>
<meta name="description" content="the desc"></head>
<body><nav><a href="/n">nav</a></nav>
<p>text <a href="/x">x</a> <a href="#">skip</a> <a href="#sec">kept</a>
<a href="javascript:a()">skip</a> <a href="mailto:a@b">skip</a></p>
</body></html>"""
        r = analyze_slow_py(html.encode(), BASE)
        assert r["title"] == "My Title"
        assert r["description"] == "the desc"
        assert r["has_nav"] is True
        # slow path keeps '#sec' (only exact '#' skipped, slowpath.go:85)
        assert r["urls"] == [
            "https://h.x/n",
            "https://h.x/x",
            "https://h.x/dir/page#sec",
        ]
        assert r["link_count"] == 3

    def test_rfc3986_resolution(self):
        r = analyze_slow_py(b'<a href="rel">x</a>', BASE)
        # urljoin drops the base's last segment (unlike the fast path)
        assert r["urls"] == ["https://h.x/dir/rel"]

    def test_document_detection_and_context(self):
        long_ctx = "word " * 60  # parent text > 200 bytes
        html = (
            f"<p>{long_ctx}<a href='/f/doc.pdf'>The Doc</a></p>"
            "<p>short <a href='/f/b.PDF'>B</a></p>"
            "<p><a href='/f/c.pdf?x=1'>not-doc-by-P6</a></p>"
        )
        r = analyze_slow_py(html.encode(), BASE)
        assert len(r["docs"]) == 2
        d0 = r["docs"][0]
        assert d0["url"] == "https://h.x/f/doc.pdf"
        assert d0["ext"] == ".pdf"
        assert d0["title"] == "The Doc"
        assert d0["context"].endswith("...") and len(d0["context"].encode()) <= 203
        d1 = r["docs"][1]
        assert d1["url"] == "https://h.x/f/b.PDF"
        assert d1["ext"] == ".PDF"
        assert d1["context"] == "short B"

    def test_title_first_only(self):
        r = analyze_slow_py(b"<title>A</title><title>B</title>", BASE)
        assert r["title"] == "A"

    def test_empty_and_garbage(self):
        assert analyze_slow_py(b"", BASE)["urls"] == []
        r = analyze_slow_py(b"<<<>>>not html<a", BASE)
        assert r["urls"] == []


def test_fast_slow_divergence_on_relative():
    """Same page, different resolvers (SURVEY §7 risk 3)."""
    html = b'<a href="rel">x</a>      '
    assert extract_links_fast_py(html, BASE) == ["https://h.x/dir/page/rel"]
    assert analyze_slow_py(html, BASE)["urls"] == ["https://h.x/dir/rel"]


def test_anchor_texts_well_formed_subset(spark):
    """The documented contract: double-quoted hrefs with tag-free
    anchor bodies extract; nested tags and single quotes don't."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.extract import (
        anchor_texts,
    )

    html = (
        '<a href="https://a/1">plain</a>'
        '<a class="x" href="https://a/2" rel="nofollow">with attrs</a>'
        '<a href="https://a/3"><b>nested</b></a>'      # excluded: tag inside
        "<a href='https://a/4'>single quoted</a>"      # excluded: quoting
        '<a href="https://a/5"></a>'                   # empty anchor kept
    )
    rows = anchor_texts(
        spark.createDataFrame([(1, html)], "id long, html string")
    ).collect()
    got = sorted((r.href, r.anchor) for r in rows)
    assert got == [
        ("https://a/1", "plain"),
        ("https://a/2", "with attrs"),
        ("https://a/5", ""),
    ]


def test_target_anchor_profile_hand_case(spark):
    """Source linking one target under two anchors counts ONCE in
    n_sources; the modal anchor tie-breaks (count DESC, anchor ASC)."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.extract import (
        target_anchor_profile,
    )

    anchors = spark.createDataFrame(
        [
            (1, "https://t/x", "docs"),
            (1, "https://t/x", "api docs"),  # same source, second anchor
            (2, "https://t/x", "docs"),
            (3, "https://t/x", "api docs"),
            (3, "https://t/y", "home"),
        ],
        "id bigint, href string, anchor string",
    )
    got = {r.href: r for r in target_anchor_profile(anchors).collect()}
    x = got["https://t/x"]
    assert (x.n_inlinks, x.n_sources, x.n_anchors) == (4, 3, 2)
    # 'api docs' and 'docs' tie at 2 -> lexicographically smaller wins
    assert (x.top_anchor, x.top_anchor_count) == ("api docs", 2)
    y = got["https://t/y"]
    assert (y.n_inlinks, y.n_sources, y.top_anchor) == (1, 1, "home")


def test_retrieval_pairs_hand_case(spark):
    """Two sources linking one target under the same anchor collapse
    to one pair with n_sources=2; short anchors drop; dangling targets
    drop; the positive doc md5 is the target's DOM text."""
    import hashlib

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.extract import (
        retrieval_pairs,
    )

    t_html = "<html><body><p>Target body text</p></body></html>"
    pages = spark.createDataFrame(
        [
            (1, "https://s1/", '<a href="https://t/">spark guide</a>'),
            (2, "https://s2/", '<a href="https://t/">spark guide</a>'
                               '<a href="https://t/">ok</a>'  # < 3 chars: dropped
                               '<a href="https://gone/">dangling link</a>'),
            (3, "https://t/", t_html),
        ],
        "id bigint, url string, html string",
    )
    got = [(r.query, r.url, r.doc_md5, r.n_sources)
           for r in retrieval_pairs(pages).collect()]
    want_md5 = hashlib.md5("Target body text".encode()).hexdigest()
    assert got == [("spark guide", "https://t/", want_md5, 2)]
