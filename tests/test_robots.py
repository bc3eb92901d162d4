"""robots.txt operator (operators/robots.py — north_rule requirement;
the reference itself ignores robots: crawler_twotier.go:56)."""

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.robots import (
    delay_budgets,
    filter_allowed,
    host_crawl_delays,
    parse_crawl_delay_py,
    parse_robots_py,
    robots_allowed_py,
    robots_rules,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.frontier import (
    CrawlConfig,
    crawl,
)

ROBOTS = """# comment
User-agent: googlebot
Disallow: /only-google

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp/*.pdf$
Disallow:
Crawl-delay: 10
"""


def test_parse_robots_star_group_only():
    rules = parse_robots_py(ROBOTS)
    assert (False, "/private") in rules
    assert (True, "/private/ok") in rules
    assert (False, "/tmp/*.pdf$") in rules
    assert not any("only-google" in p for _, p in rules)


def test_verdict_longest_match_and_tie():
    rules = parse_robots_py(ROBOTS)
    assert robots_allowed_py("/", rules)
    assert robots_allowed_py("/public/x", rules)
    assert not robots_allowed_py("/private", rules)
    assert not robots_allowed_py("/private/secret", rules)
    assert robots_allowed_py("/private/ok", rules)  # longer Allow wins
    assert robots_allowed_py("/private/ok/deep", rules)
    assert not robots_allowed_py("/tmp/a.pdf", rules)  # wildcard + anchor
    assert robots_allowed_py("/tmp/a.pdfx", rules)  # $ anchored
    assert robots_allowed_py("/anything", [])  # no rules => allow


def test_parse_crawl_delay():
    assert parse_crawl_delay_py(ROBOTS) == 10.0  # inside the * group
    assert parse_crawl_delay_py(None) is None
    assert parse_crawl_delay_py("") is None
    # delay in a non-* group is not ours
    assert parse_crawl_delay_py("User-agent: bot\nCrawl-delay: 5\n") is None
    # a later non-* group must not leak its delay into the * group
    assert (
        parse_crawl_delay_py(
            "User-agent: *\nCrawl-delay: 2\nUser-agent: bot\nCrawl-delay: 9\n"
        )
        == 2.0
    )
    # last valid value in the * group wins
    assert (
        parse_crawl_delay_py("User-agent: *\nCrawl-delay: 2\nCrawl-delay: 4.5\n")
        == 4.5
    )
    # junk and negatives ignored
    assert parse_crawl_delay_py("User-agent: *\nCrawl-delay: soon\n") is None
    assert parse_crawl_delay_py("User-agent: *\nCrawl-delay: -3\n") is None


def test_verdict_allow_wins_equal_length():
    rules = [(False, "/a/b"), (True, "/a/b")]
    assert robots_allowed_py("/a/b", rules)


def _site(spark):
    rows = [
        ("https://s.example/robots.txt", "User-agent: *\nDisallow: /blocked\n"),
        (
            "https://s.example/",
            '<html><body><a href="/ok">a</a><a href="/blocked/x">b</a></body></html>',
        ),
        ("https://s.example/ok", "<html><body>fine</body></html>"),
        ("https://s.example/blocked/x", '<html><body><a href="/leak">c</a></body></html>'),
        ("https://s.example/leak", "<html><body>leak</body></html>"),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_rules_table_and_filter(spark):
    corpus = _site(spark).selectExpr("url as url_norm", "html")
    rules = robots_rules(corpus)
    got = {r.host: r.rules for r in rules.collect()}
    assert list(got) == ["s.example"]
    frontier = spark.createDataFrame(
        [
            ("https://s.example/ok", "s.example"),
            ("https://s.example/blocked/x", "s.example"),
            ("https://other.example/blocked", "other.example"),  # no robots => pass
        ],
        "url_norm string, host string",
    )
    kept = {r.url_norm for r in filter_allowed(frontier, rules).collect()}
    assert kept == {"https://s.example/ok", "https://other.example/blocked"}


def test_crawl_respects_robots(spark):
    pages = _site(spark)
    seeds = spark.createDataFrame([("https://s.example/", 0)], "url string, depth int")
    res = crawl(spark, pages, seeds, CrawlConfig(respect_robots=True))
    seen = {r.url_norm for r in res.seen.collect()}
    assert "https://s.example/ok" in seen
    assert "https://s.example/blocked/x" not in seen
    assert "https://s.example/leak" not in seen  # never fetched, so never discovered

    # reference-parity default: robots ignored
    res2 = crawl(spark, pages, seeds, CrawlConfig())
    seen2 = {r.url_norm for r in res2.seen.collect()}
    assert "https://s.example/blocked/x" in seen2 and "https://s.example/leak" in seen2


def _delay_site(spark):
    """Two hosts cross-linking a fan of pages; slow.example asks for one
    request per 5 s, fast.example declares no delay."""
    fan = "".join(f'<a href="/p{i}">l</a>' for i in range(6))
    rows = [
        ("https://slow.example/robots.txt", "User-agent: *\nCrawl-delay: 5\n"),
        (
            "https://slow.example/",
            f'<html><body>{fan}<a href="https://fast.example/">x</a></body></html>',
        ),
        ("https://fast.example/", f"<html><body>{fan}</body></html>"),
    ] + [
        (f"https://{h}.example/p{i}", "<html><body>leaf</body></html>")
        for h in ("slow", "fast")
        for i in range(6)
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_crawl_delay_extraction_and_budgets(spark):
    corpus = _delay_site(spark).selectExpr("url as url_norm", "html")
    delays = {r.host: r.crawl_delay for r in host_crawl_delays(corpus).collect()}
    assert delays == {"slow.example": 5.0}
    budgets = {
        r.host: r.budget
        for r in delay_budgets(host_crawl_delays(corpus), window_s=10.0).collect()
    }
    assert budgets == {"slow.example": 2}  # floor(10/5)
    # cap and the >=1 floor
    capped = {
        r.host: r.budget
        for r in delay_budgets(
            host_crawl_delays(corpus), window_s=100.0, cap=7
        ).collect()
    }
    assert capped == {"slow.example": 7}
    tiny = {
        r.host: r.budget
        for r in delay_budgets(host_crawl_delays(corpus), window_s=1.0).collect()
    }
    assert tiny == {"slow.example": 1}


def test_crawl_honors_crawl_delay_budgets(spark):
    pages = _delay_site(spark)
    seeds = spark.createDataFrame([("https://slow.example/", 0)], "url string, depth int")
    throttled = crawl(
        spark,
        pages,
        seeds,
        CrawlConfig(respect_robots=True, crawl_delay_window_s=10.0),
    )
    free = crawl(spark, pages, seeds, CrawlConfig(respect_robots=True))
    # deferral only delays discovery: the final url set is identical
    assert {r.url_norm for r in throttled.seen.collect()} == {
        r.url_norm for r in free.seen.collect()
    }
    # but the slow host is held to floor(10/5)=2 fetches per iteration
    # (6 leaf pages / 2 ≥ 3 extra supersteps), so the throttled crawl
    # needs strictly more iterations while fetching the same pages
    assert throttled.iterations > free.iterations
    assert sum(m["fetched"] for m in throttled.metrics) == sum(
        m["fetched"] for m in free.metrics
    )


def test_robots_sitemaps_directive_parse(spark):
    """Sitemap: anywhere in the file, any case, flexible whitespace,
    several per file; non-robots urls and directive-free bodies emit
    nothing; duplicates collapse."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.robots import (
        robots_sitemaps,
    )

    body_a = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a.example/s1.xml\n"
        "  sitemap:\thttps://a.example/s2.xml\n"
        "SITEMAP: https://a.example/s1.xml\n"  # duplicate collapses
    )
    corpus = spark.createDataFrame(
        [
            ("https://a.example/robots.txt", body_a),
            ("https://b.example/robots.txt", "User-agent: *\nAllow: /\n"),
            ("https://c.example/page.html", "Sitemap: https://c.example/s.xml"),
        ],
        "url_norm string, html string",
    )
    got = sorted((r.host, r.sitemap_url) for r in robots_sitemaps(corpus).collect())
    assert got == [
        ("a.example", "https://a.example/s1.xml"),
        ("a.example", "https://a.example/s2.xml"),
    ]


def test_clean_param_rules_and_strip(spark):
    """Clean-param: params strip only under their declared path
    prefix; prefix-less rules apply host-wide; unrelated hosts pass
    through; survivors sort canonically."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.robots import (
        clean_param_rules,
        strip_declared_params,
    )

    robots = spark.createDataFrame(
        [
            (
                "https://a.example/robots.txt",
                "User-agent: *\nClean-param: sid&ref /shop/\nCLEAN-PARAM: utm\n",
            ),
        ],
        "url_norm string, html string",
    )
    rules = {
        (r.host, r.param, r.path_prefix)
        for r in clean_param_rules(robots).collect()
    }
    assert rules == {
        ("a.example", "sid", "/shop/"),
        ("a.example", "ref", "/shop/"),
        ("a.example", "utm", "/"),
    }

    urls = spark.createDataFrame(
        [
            ("https://a.example/shop/i?z=1&sid=9&utm=x&ref=r",),
            ("https://a.example/blog/p?z=1&sid=9&utm=x",),
            ("https://other.example/shop/i?sid=9",),
        ],
        "url string",
    )
    got = {r.url: r.url_canon for r in strip_declared_params(urls, clean_param_rules(robots)).collect()}
    assert got["https://a.example/shop/i?z=1&sid=9&utm=x&ref=r"] == "https://a.example/shop/i?z=1"
    # sid scoped to /shop/: kept on the blog path; utm host-wide: gone
    assert got["https://a.example/blog/p?z=1&sid=9&utm=x"] == "https://a.example/blog/p?sid=9&z=1"
    assert got["https://other.example/shop/i?sid=9"] == "https://other.example/shop/i?sid=9"


LAYERED = (
    "User-agent: *\nDisallow: /private\n\n"
    "User-agent: graft\nDisallow: /beta\n\n"
    "User-agent: graftbot\nUser-agent: newsbot\n"
    "Disallow: /gamma\nAllow: /gamma/ok\n"
)


def test_agent_group_longest_prefix_wins():
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.robots import (
        select_agent_rules_py,
    )

    # 'graftbot' matches both 'graft' and 'graftbot'; only the longer
    # group binds — shared-group tokens merge (newsbot gets the same)
    assert select_agent_rules_py(LAYERED, "graftbot") == [
        (False, "/gamma"), (True, "/gamma/ok")
    ]
    assert select_agent_rules_py(LAYERED, "newsbot-images") == [
        (False, "/gamma"), (True, "/gamma/ok")
    ]
    # a shorter product name only reaches the 'graft' group
    assert select_agent_rules_py(LAYERED, "graftling") == [(False, "/beta")]
    # unknown agents fall back to '*'
    assert select_agent_rules_py(LAYERED, "unknown") == [(False, "/private")]
    # case-insensitive on both sides
    assert select_agent_rules_py(LAYERED, "GraftBot") == [
        (False, "/gamma"), (True, "/gamma/ok")
    ]


def test_agent_star_reduces_to_legacy_parser():
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.robots import (
        parse_robots_py,
        select_agent_rules_py,
    )

    fixtures = [
        LAYERED,
        "User-agent: *\nDisallow: /a\nAllow: /a/b\n",
        "User-agent: megabot\nDisallow: /x\n",
        "Disallow: /orphan\n",  # rules before any group: ignored
        "",
        "User-agent: *\nUser-agent: extra\nDisallow: /both\n",
    ]
    for fx in fixtures:
        assert select_agent_rules_py(fx, "*") == parse_robots_py(fx), fx
