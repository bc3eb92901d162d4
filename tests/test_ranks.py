"""host_pagerank (operators/ranks.py) — semantics vs a pure-python
single-threaded reference, plus the structural invariants the
scheduler contract relies on."""

from __future__ import annotations

import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.ranks import (
    host_pagerank,
)


def _pr_reference(edges, n_iters=3, d=0.85):
    """The documented semantics, computed sequentially."""
    e = sorted(set(edges))
    hosts = sorted({s for s, _ in e} | {t for _, t in e})
    n = len(hosts)
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {h: 1.0 / n for h in hosts}
    for _ in range(n_iters):
        inflow = {h: 0.0 for h in hosts}
        for s, t in e:
            inflow[t] += pr[s] / outdeg[s]
        pr = {h: (1.0 - d) / n + d * inflow[h] for h in hosts}
    return pr


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    return {
        r["host"]: r["host_rank"] for r in host_pagerank(df, **kw).collect()
    }


def test_hand_graph_one_iteration(spark):
    # A -> B, B -> A, A -> C;  N=3, pr0 = 1/3 each
    # outdeg(A)=2, outdeg(B)=1, C dangling
    # pr1(A) = 0.05 + 0.85*(1/3)        (from B)
    # pr1(B) = 0.05 + 0.85*(1/6)        (from A, split 2 ways)
    # pr1(C) = 0.05 + 0.85*(1/6)
    got = _run(spark, [("A", "B"), ("B", "A"), ("A", "C")], n_iters=1)
    assert got["A"] == pytest.approx(0.05 + 0.85 / 3)
    assert got["B"] == pytest.approx(0.05 + 0.85 / 6)
    assert got["C"] == pytest.approx(0.05 + 0.85 / 6)


def test_matches_python_reference_on_random_graph(spark):
    import random

    rng = random.Random(42)
    hosts = [f"h{i}" for i in range(17)]
    edges = list(
        {
            (rng.choice(hosts), rng.choice(hosts))
            for _ in range(120)
        }
    )
    want = _pr_reference(edges, n_iters=4)
    got = _run(spark, edges, n_iters=4)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], rel=1e-12), h


def test_duplicate_edges_collapse(spark):
    base = _run(spark, [("A", "B"), ("B", "A")], n_iters=2)
    dup = _run(spark, [("A", "B"), ("A", "B"), ("B", "A")], n_iters=2)
    assert base == dup


def test_dangling_mass_leaks_but_teleport_floor_holds(spark):
    # star into a sink: every rank ≥ (1-d)/N, total ≤ 1
    got = _run(spark, [("A", "D"), ("B", "D"), ("C", "D")], n_iters=3)
    n = len(got)
    assert all(v >= (1.0 - 0.85) / n - 1e-15 for v in got.values())
    assert sum(got.values()) <= 1.0 + 1e-12
    # the sink concentrates rank
    assert got["D"] == max(got.values())


def test_pagerank_budgeted_crawl_reaches_same_urls(spark):
    """Closing the rank-aware-scheduler loop end-to-end: host_ranks
    produced by host_pagerank(host_edges(corpus)) drive a globally
    budgeted crawl that defers, never drops — the final seen set
    equals the unbudgeted crawl's.

    Both runs raise max_depth so the F1 cutoff never binds: unlike the
    depth-ordered trim, rank-first ordering can discover a URL via a
    LONGER path than BFS would (deferring its low-rank short-path
    parent), inflating recorded depth — with the default cutoff a URL
    whose every in-budget discovery path crosses depth 13 is then
    legitimately dropped (measured: exactly 1 of 500 at sf0.001,
    ranked max depth 13 vs BFS 7). That cutoff x priority interaction
    is inherent to path-depth caps under non-BFS scheduling; the
    defer-never-drop property is what this test pins."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.ranks import (
        host_edges,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.frontier import (
        CrawlConfig,
        crawl,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources import (
        pages as pagesrc,
    )

    pages = pagesrc.synth_clean_pages(spark, "/root/testdata/sf0.001")
    seeds = spark.sql(pagesrc.seeds_sql())
    ranks = host_pagerank(host_edges(pages)).localCheckpoint(eager=True)
    free = crawl(spark, pages, seeds, CrawlConfig(max_depth=50))
    ranked = crawl(
        spark,
        pages,
        seeds,
        CrawlConfig(max_depth=50, global_budget=25, max_iterations=100),
        host_ranks=ranks,
    )
    assert ranked.iterations > free.iterations
    assert all(m["scheduled"] <= 25 for m in ranked.metrics)
    a = {r.url_norm for r in free.seen.select("url_norm").collect()}
    b = {r.url_norm for r in ranked.seen.select("url_norm").collect()}
    assert a == b


def _snaps(spark, rows):
    return spark.createDataFrame(
        rows, "url_norm string, warc_ts timestamp, content_md5 string"
    )


def test_recrawl_schedule_ranks_by_staleness_and_caps_per_host(spark):
    from datetime import datetime as dt

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.ranks import (
        recrawl_schedule,
    )

    t = lambda s: dt(2025, 1, 1, 0, s // 60, s % 60)  # noqa: E731
    rows = [
        # hostA/hot: changes every fetch, last seen t=10 -> rate 1.0, age 50
        ("https://a.example/hot", t(0), "v1"),
        ("https://a.example/hot", t(5), "v2"),
        ("https://a.example/hot", t(10), "v3"),
        # hostA/warm: 1 change in 2 intervals, last t=20 -> rate .5, age 40
        ("https://a.example/warm", t(0), "x"),
        ("https://a.example/warm", t(15), "x"),
        ("https://a.example/warm", t(20), "y"),
        # hostA/static: never changes -> staleness 0.0
        ("https://a.example/static", t(0), "s"),
        ("https://a.example/static", t(30), "s"),
        # hostB/only: single version -> rate 0, staleness 0, still rank 1
        ("https://b.example/only", t(60), "q"),  # also sets now=60
    ]
    out = recrawl_schedule(_snaps(spark, rows), per_host_budget=2)
    got = {r.url_norm: r for r in out.collect()}
    # budget: hostA has 3 urls, only 2 survive; the zero-staleness
    # static page is the one cut
    assert set(got) == {
        "https://a.example/hot",
        "https://a.example/warm",
        "https://b.example/only",
    }
    hot, warm = got["https://a.example/hot"], got["https://a.example/warm"]
    assert (hot.rank, warm.rank) == (1, 2)
    assert hot.staleness == 1.0 * 50 and warm.staleness == 0.5 * 40
    assert hot.age_s == 50 and warm.age_s == 40
    only = got["https://b.example/only"]
    assert (only.rank, only.staleness, only.n_versions) == (1, 0.0, 1)


def test_recrawl_schedule_ties_break_by_url(spark):
    from datetime import datetime as dt

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.ranks import (
        recrawl_schedule,
    )

    t = lambda s: dt(2025, 1, 1, 0, 0, s)  # noqa: E731
    # two urls on one host with IDENTICAL staleness -> url ASC wins
    rows = [
        ("https://h.example/b", t(0), "1"),
        ("https://h.example/b", t(10), "2"),
        ("https://h.example/a", t(0), "1"),
        ("https://h.example/a", t(10), "2"),
    ]
    out = recrawl_schedule(_snaps(spark, rows), per_host_budget=1)
    rows_out = out.collect()
    assert len(rows_out) == 1 and rows_out[0].url_norm == "https://h.example/a"


def test_recrawl_wave_refetches_through_tier2(spark, sf_small):
    """Closes the recrawl loop: corpus snapshots -> change rates ->
    scheduled revisit wave -> tier-2 refetch. The wave's columns feed
    fetch_and_extract directly, every scheduled url re-fetches 200,
    and within any host that has changed pages the stalest (changed)
    page outranks the never-changed ones."""
    from pyspark.sql import functions as F

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import (
        fetch,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.ranks import (
        recrawl_schedule,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources import (
        pages,
    )

    corpus = pages.synth_clean_pages(spark, sf_small)
    base = corpus.select(
        F.col("url").alias("url_norm"),
        "warc_ts",
        F.md5("html").alias("content_md5"),
    )
    changed = F.xxhash64("url_norm") % 3 == 0
    v2 = base.select(
        "url_norm",
        (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")).alias("warc_ts"),
        F.when(changed, F.md5(F.concat("content_md5", F.lit("x"))))
        .otherwise(F.col("content_md5"))
        .alias("content_md5"),
    )
    snaps = base.unionByName(v2)
    wave = recrawl_schedule(snaps, per_host_budget=3).localCheckpoint()

    # changed pages have staleness > 0, unchanged exactly 0 -> any host
    # with a changed page must lead its wave with one
    lead = {r.host: r.staleness for r in wave.filter("rank = 1").collect()}
    hosts_with_changes = {
        r.host
        for r in snaps.filter(changed)
        .select(F.regexp_extract("url_norm", r"^[a-z]+://([^/]+)", 1).alias("host"))
        .distinct()
        .collect()
    }
    for h in hosts_with_changes:
        assert lead[h] > 0.0, f"host {h} leads with an unchanged page"

    # the wave feeds tier-2 directly and every url re-fetches from the
    # live corpus
    queue = wave.select(F.col("url_norm").alias("url"), "host")
    out = fetch.fetch_and_extract(
        queue, corpus.select(F.col("url").alias("url_norm"), "html")
    ).collect()
    assert len(out) == wave.count()
    assert all(r.status == 200 and r.text is not None for r in out)


def test_host_reciprocity_hand_case(spark):
    """Ring a<->b<->c<->a fully reciprocated (farm); d links out to
    the ring and gets nothing back; self-loops never count."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.ranks import (
        host_reciprocity,
    )

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),
            ("b", "c"), ("c", "b"),
            ("c", "a"), ("a", "c"),
            ("d", "a"), ("d", "b"), ("d", "d"),
            ("a", "b"),  # duplicate edge collapses
        ],
        "src_host string, dst_host string",
    )
    got = {r.host: r for r in host_reciprocity(edges).collect()}
    for h in "abc":
        assert (got[h].n_out, got[h].n_reciprocal, got[h].link_farm) == (2, 2, True)
    assert (got["d"].n_out, got["d"].n_reciprocal, got["d"].link_farm) == (
        2,
        0,
        False,
    )


def test_host_hits_hub_authority_split(spark):
    """A pure-hub host (only outlinks) earns hub mass but zero
    authority; the pure-authority target is the reverse; L1 sums are 1
    per score; 2 iterations are deterministic."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.ranks import (
        host_hits,
    )

    edges = spark.createDataFrame(
        [
            ("hub.x", "auth.x"),
            ("hub.x", "auth2.x"),
            ("mid.x", "auth.x"),
            ("auth.x", "mid.x"),  # a back-edge so auth.x isn't pure
        ],
        "src_host string, dst_host string",
    )
    out = {r["host"]: r for r in host_hits(edges, n_iters=2).collect()}
    assert abs(sum(r["hub"] for r in out.values()) - 1.0) < 1e-9
    assert abs(sum(r["auth"] for r in out.values()) - 1.0) < 1e-9
    assert out["hub.x"].auth == 0.0  # nothing links TO hub.x
    assert out["auth2.x"].hub == 0.0  # auth2.x links to nothing
    assert out["hub.x"].hub > out["auth.x"].hub
    assert out["auth.x"].auth > out["hub.x"].auth
