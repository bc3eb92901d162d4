"""Redirect-chain resolution semantics (redirects.resolve_redirects).

Reference behavior: colly/net/http transparently follow 3xx chains and
abort after 10 hops; only the final response reaches the status gate
(downloader/downloader.go:200). The batch operator must classify
exactly: terminating chains <= max_hops -> ok with exact hop count;
loops and longer chains -> stuck.
"""

import pytest
from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.redirects import (
    resolve_redirects,
)


def _resolve(spark, edges, urls, max_hops=10):
    redirects = spark.createDataFrame(edges, "src string, dst string")
    requests = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = resolve_redirects(requests, redirects, max_hops=max_hops).collect()
    return {r["url"]: (r["status"], r["final_url"], r["n_hops"]) for r in rows}

def test_plain_url_is_identity(spark):
    out = _resolve(spark, [("a", "b")], ["x"])
    assert out["x"] == ("ok", "x", 0)


def test_single_hop(spark):
    out = _resolve(spark, [("a", "b")], ["a"])
    assert out["a"] == ("ok", "b", 1)


def test_chain_exact_hops(spark):
    edges = [(f"u{i}", f"u{i+1}") for i in range(7)]  # u0 -> ... -> u7
    out = _resolve(spark, edges, ["u0", "u3", "u7"])
    assert out["u0"] == ("ok", "u7", 7)
    assert out["u3"] == ("ok", "u7", 4)
    assert out["u7"] == ("ok", "u7", 0)


def test_chain_at_and_past_the_policy_bound(spark):
    # chain of length 12: heads deeper than 10 hops from the terminal
    # are stuck, exactly at the net/http boundary (10 ok, 11 stuck)
    edges = [(f"c{i}", f"c{i+1}") for i in range(12)]
    out = _resolve(spark, edges, ["c0", "c1", "c2"])
    assert out["c2"] == ("ok", "c12", 10)
    assert out["c1"] == ("stuck", None, None)
    assert out["c0"] == ("stuck", None, None)


def test_two_cycle_is_stuck(spark):
    out = _resolve(spark, [("p", "q"), ("q", "p")], ["p", "q", "z"])
    assert out["p"] == ("stuck", None, None)
    assert out["q"] == ("stuck", None, None)
    assert out["z"] == ("ok", "z", 0)


def test_self_loop_is_stuck(spark):
    out = _resolve(spark, [("s", "s")], ["s"])
    assert out["s"] == ("stuck", None, None)


def test_tail_into_cycle_is_stuck(spark):
    edges = [("t0", "t1"), ("t1", "t2"), ("t2", "t1")]
    out = _resolve(spark, edges, ["t0"])
    assert out["t0"] == ("stuck", None, None)


@pytest.mark.parametrize("max_hops", [1, 2, 3])
def test_custom_bound(spark, max_hops):
    edges = [(f"b{i}", f"b{i+1}") for i in range(3)]
    out = _resolve(spark, edges, ["b0"], max_hops=max_hops)
    if max_hops >= 3:
        assert out["b0"] == ("ok", "b3", 3)
    else:
        assert out["b0"] == ("stuck", None, None)


def test_join_count_is_logarithmic_not_per_hop(spark):
    """The plan composes the jump table ceil(log2(max_hops))+1 times —
    the number of joins is fixed by max_hops, not by chain length, so
    a 10^10-row frontier pays O(log hops) shuffles, never one per hop."""
    edges = [(f"u{i}", f"u{i+1}") for i in range(9)]
    redirects = spark.createDataFrame(edges, "src string, dst string")
    requests = spark.createDataFrame([("u0",)], "url string")
    def n_joins(n_edges):
        e = spark.createDataFrame(
            [(f"u{i}", f"u{i+1}") for i in range(n_edges)], "src string, dst string"
        )
        out = resolve_redirects(requests, e, max_hops=10)
        return out._jdf.queryExecution().optimizedPlan().toString().count("Join")

    # the composition tree references the jump table twice per round, so
    # the *logical* plan has O(2^rounds) joins (rounds=4 at max_hops=10)
    # — but the count is a constant of max_hops, identical for a 9-edge
    # and a 200-edge map; execution dedupes the repeated subtrees via
    # ReuseExchange. The O(per-hop-job) failure mode would scale joins
    # with chain length.
    assert n_joins(9) == n_joins(200)
    out = resolve_redirects(requests, redirects, max_hops=10)
    assert out.filter(F.col("status") == "ok").count() == 1


def _page(url, canonical=None):
    if canonical is None:
        return (url, "<html><head></head><body>x</body></html>")
    return (url, f'<html><head><link rel="canonical" href="{canonical}"></head></html>')


def test_canonical_clusters_variants_chain_loop(spark):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.redirects import (
        canonical_clusters,
    )

    rows = [
        _page("base"),
        _page("base?utm=1", "base"),
        _page("base/amp", "base?utm=1"),  # 2-level chain -> base
        _page("loop1", "loop2"),
        _page("loop2", "loop1"),
        _page("dangler", "not-in-corpus"),
        _page("solo"),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    out = {r["url"]: r for r in canonical_clusters(pages).collect()}
    assert out["base"].canonical_url == "base" and out["base"].is_canonical
    assert out["base"].n_members == 3
    assert out["base?utm=1"].canonical_url == "base"
    assert out["base/amp"].canonical_url == "base"
    assert not out["base?utm=1"].is_canonical
    assert out["base?utm=1"].n_members == 0
    # canonical loop: fall back to self, each its own singleton cluster
    assert out["loop1"].canonical_url == "loop1" and out["loop1"].n_members == 1
    assert out["loop2"].canonical_url == "loop2"
    # dangling canonical: the mapping points off-corpus; no cluster row
    assert out["dangler"].canonical_url == "not-in-corpus"
    assert not out["dangler"].is_canonical and out["dangler"].n_members == 0
    assert out["solo"].canonical_url == "solo" and out["solo"].n_members == 1


def test_crawl_follows_redirects_transparently(spark):
    """crawl(redirects=...): a link to a redirect source lands on the
    FINAL url at the parent's depth+1 (3xx hops cost no depth), the
    source never enters seen, and loop targets drop like net/http's
    redirect abort."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.frontier import (
        CrawlConfig,
        crawl,
    )

    def page(url, *hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return (url, f"<html><body>{body}</body></html>")

    pages = spark.createDataFrame(
        [
            page(
                "https://s.example/a",
                "https://s.example/r1",
                "https://s.example/loopa",
            ),
            page("https://s.example/b", "https://s.example/c"),
            page("https://s.example/c"),
            # content at a redirect source must never be fetched
            page("https://s.example/r1", "https://s.example/poison"),
        ],
        "url string, html string",
    )
    redirects = spark.createDataFrame(
        [
            ("https://s.example/r1", "https://s.example/b"),
            ("https://s.example/loopa", "https://s.example/loopb"),
            ("https://s.example/loopb", "https://s.example/loopa"),
        ],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("https://s.example/a", 0)], "url string, depth int")
    res = crawl(spark, pages, seeds, CrawlConfig(), redirects=redirects)
    seen = {r["url_norm"]: r["depth"] for r in res.seen.collect()}
    assert seen == {
        "https://s.example/a": 0,
        "https://s.example/b": 1,  # via r1, transparent hop
        "https://s.example/c": 2,
    }
