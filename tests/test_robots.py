"""robots.txt operator (operators/robots.py — north_rule requirement;
the reference itself ignores robots: crawler_twotier.go:56)."""

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.robots import (
    filter_allowed,
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
