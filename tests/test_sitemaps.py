"""Sitemap ingestion (operators/sitemaps.py — engine-native; the
reference discovers by link-walking only)."""

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.sitemaps import (
    sitemap_entries,
    sitemap_index_children,
    sitemap_seeds,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.frontier import (
    CrawlConfig,
    crawl,
)

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.example/p1 </loc>
    <lastmod>2026-03-01</lastmod>
  </url>
  <url><loc>https://a.example/p2</loc></url>
</urlset>
"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://a.example/parts/x.xml</loc></sitemap>
</sitemapindex>
"""

CHILD = "<urlset><url><loc>https://a.example/p3</loc><lastmod>2026-04-01</lastmod></url></urlset>"


def _corpus(spark):
    rows = [
        ("https://a.example/sitemap.xml", URLSET),
        ("https://a.example/sitemap-index.xml", INDEX),
        ("https://a.example/parts/x.xml", CHILD),  # name misses the pattern
        ("https://a.example/p1", "<html><body>x</body></html>"),
        # a second sitemap repeats p1 with a LATER lastmod
        (
            "https://b.example/sitemap.xml",
            "<urlset><url><loc>https://a.example/p1</loc>"
            "<lastmod>2026-05-01</lastmod></url></urlset>",
        ),
    ]
    return spark.createDataFrame(rows, "url_norm string, html string")


def test_entries_whitespace_and_optional_lastmod(spark):
    got = {
        (r.loc, r.lastmod)
        for r in sitemap_entries(_corpus(spark))
        .filter("sitemap_url = 'https://a.example/sitemap.xml'")
        .collect()
    }
    assert got == {
        ("https://a.example/p1", "2026-03-01"),
        ("https://a.example/p2", None),
    }


def test_index_children_and_unmatched_child_resolution(spark):
    kids = sitemap_index_children(_corpus(spark)).collect()
    assert [(k.index_url, k.child) for k in kids] == [
        ("https://a.example/sitemap-index.xml", "https://a.example/parts/x.xml")
    ]
    seeds = {
        (r.host, r.loc): r.lastmod for r in sitemap_seeds(_corpus(spark)).collect()
    }
    # p3 only reachable through the index (child name misses the pattern)
    assert seeds[("a.example", "https://a.example/p3")] == "2026-04-01"
    # duplicate loc across sitemaps keeps the max lastmod
    assert seeds[("b.example", "https://a.example/p1")] == "2026-05-01"
    assert seeds[("a.example", "https://a.example/p1")] == "2026-03-01"
    assert len(seeds) == 4  # p1 (a+b), p2, p3


def test_crawl_discovers_sitemap_urls(spark):
    """An island page listed only in a sitemap (no inlinks) is crawled
    with discover_sitemaps=True and missed without it."""
    rows = [
        (
            "https://s.example/sitemap.xml",
            "<urlset><url><loc>https://s.example/island</loc></url></urlset>",
        ),
        ("https://s.example/", '<html><body><a href="/linked">a</a></body></html>'),
        ("https://s.example/linked", "<html><body>x</body></html>"),
        ("https://s.example/island", '<html><body><a href="/cove">y</a></body></html>'),
        ("https://s.example/cove", "<html><body>z</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    seeds = spark.createDataFrame([("https://s.example/", 0)], "url string, depth int")

    plain = {r.url_norm for r in crawl(spark, pages, seeds, CrawlConfig()).seen.collect()}
    assert "https://s.example/island" not in plain

    res = crawl(spark, pages, seeds, CrawlConfig(discover_sitemaps=True))
    seen = {r.url_norm: r.depth for r in res.seen.select("url_norm", "depth").collect()}
    assert seen["https://s.example/island"] == 0  # seeded, not walked
    assert "https://s.example/cove" in seen  # BFS continues past it
    assert "https://s.example/linked" in seen
