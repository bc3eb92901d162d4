"""Crawl-equivalence and resume tests (SURVEY.md §5.2/§5.4).

The quirks corpus exercises every extraction/normalization edge; the
oracle is the single-threaded reference-semantics loop in oracle.py.
Crawls are expensive (14 BFS supersteps), so they run once per module
via fixtures and every assertion shares the results.
"""

import tempfile

import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.frontier import (
    CrawlConfig,
    crawl,
    resume,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources.pages import (
    quirk_pages,
    quirk_pages_rows,
)

from oracle import reference_crawl

SEED = "https://quirk.example/"


def run_engine(spark, cfg=None):
    pages = quirk_pages(spark)
    seeds = spark.createDataFrame([(SEED, 0)], "url string, depth int")
    return crawl(spark, pages, seeds, cfg or CrawlConfig())


@pytest.fixture(scope="module")
def full(spark):
    res = run_engine(spark)
    return {
        "seen": {(r.url_norm, r.depth) for r in res.seen.collect()},
        "downloads": [(r.url, r.status, r.retry) for r in res.downloads.collect()],
        "metrics": res.metrics,
        "iterations": res.iterations,
        "n_seen": res.seen.count(),
    }


@pytest.fixture(scope="module")
def budgeted(spark):
    res = run_engine(spark, CrawlConfig(budget_per_host=3, max_iterations=60))
    return {
        "seen": {(r.url_norm, r.depth) for r in res.seen.collect()},
        "metrics": res.metrics,
    }


def test_quirks_crawl_matches_oracle(full):
    oracle_seen, oracle_docs, oracle_dl = reference_crawl(
        dict(quirk_pages_rows()), [SEED]
    )
    assert full["seen"] == set(oracle_seen.items())
    # download attempts keyed on RAW doc url (downloader.go:280-286)
    assert {u for u, _, _ in full["downloads"]} == oracle_dl
    # every attempted URL is a dangling .pdf here -> all failed at retry>3
    assert {(s, r) for _, s, r in full["downloads"]} == {("failed", 4)}


def test_depth_cutoff(full):
    depths = dict(full["seen"])
    assert depths["https://quirk.example/chain/11"] == 13
    assert "https://quirk.example/chain/12" not in depths  # F1 at MaxDepth=13
    assert max(depths.values()) == 13


def test_politeness_same_set(full, budgeted):
    a = {u for u, _ in full["seen"]}
    b = {u for u, _ in budgeted["seen"]}
    assert a == b  # deferral reorders discovery but never loses URLs


def test_budget_enforced_per_iteration(budgeted):
    assert all(m["scheduled"] <= 3 for m in budgeted["metrics"])  # single host


def test_resume_identical(spark, full):
    with tempfile.TemporaryDirectory() as ck:
        partial = run_engine(spark, CrawlConfig(max_iterations=2, checkpoint_dir=ck))
        assert partial.iterations == 2
        # the interruption must land mid-flight for the downloads leg
        # of the resume to be exercised (retry queue non-trivial)
        res = resume(spark, quirk_pages(spark), CrawlConfig(checkpoint_dir=ck))
        got = {(r.url_norm, r.depth) for r in res.seen.collect()}
        got_dl = sorted(
            (r.url, r.status, r.retry) for r in res.downloads.collect()
        )
    assert got == full["seen"]
    # downloads state (J2/J3/C5) resumes exactly too: closed entries
    # come back from the merged snapshot deltas, in-flight retries from
    # the pending snapshot, and the continuation finishes them off
    assert got_dl == sorted(full["downloads"])


def test_resume_time_travel(spark, full):
    """Iceberg-style time travel: a crawl checkpointed for 4 iterations
    can be resumed from ANY committed snapshot (as_of), not just the
    latest — and a continuation from iter 2 of a 4-iter run replays
    deterministically onto the same final state. Also pins rejection of
    out-of-range as_of."""
    with tempfile.TemporaryDirectory() as ck:
        partial = run_engine(spark, CrawlConfig(max_iterations=4, checkpoint_dir=ck))
        assert partial.iterations == 4
        res = resume(
            spark, quirk_pages(spark), CrawlConfig(checkpoint_dir=ck), as_of=2
        )
        got = {(r.url_norm, r.depth) for r in res.seen.collect()}
        got_dl = sorted((r.url, r.status, r.retry) for r in res.downloads.collect())
        # the continuation kept committing to the same store, so the
        # pointer moved past 4 — probe far beyond any committed iter
        with pytest.raises(ValueError):
            resume(
                spark, quirk_pages(spark), CrawlConfig(checkpoint_dir=ck), as_of=999
            )
    assert got == full["seen"]
    assert got_dl == sorted(full["downloads"])


def test_metrics_shape(full):
    m1 = full["metrics"][0]
    assert m1["scheduled"] == 1 and m1["fetched"] == 1
    assert m1["fast_cnt"] + m1["slow_cnt"] == m1["fetched"]
    total_new = sum(m["new_urls"] for m in full["metrics"])
    assert total_new == full["n_seen"] - 1  # all but the seed


def test_bloom_crawl_identical(spark, full):
    """J1 behind the sharded-Bloom prefilter (CrawlConfig.use_bloom)
    must be bit-for-bit the exact-join crawl: false positives fall
    through to the authoritative anti-join, false negatives are
    impossible (every seen key is OR-ed into its shard)."""
    res = run_engine(spark, CrawlConfig(use_bloom=True, bloom_shards=8,
                                        bloom_bits_per_shard=1 << 16))
    got = {(r.url_norm, r.depth) for r in res.seen.collect()}
    assert got == full["seen"]


def test_cuckoo_crawl_identical(spark, full):
    """J1 behind the sharded-cuckoo prefilter (CrawlConfig.use_cuckoo,
    operators/cuckoo.py) must be bit-for-bit the exact-join crawl —
    the same contract as the Bloom path, with per-superstep state
    maintenance via INCREMENTAL INSERTS instead of OR-merges."""
    res = run_engine(spark, CrawlConfig(use_cuckoo=True, cuckoo_shards_n=8))
    got = {(r.url_norm, r.depth) for r in res.seen.collect()}
    assert got == full["seen"]


def test_bloom_cuckoo_mutually_exclusive(spark):
    import pytest as _pt

    with _pt.raises(ValueError):
        run_engine(spark, CrawlConfig(use_bloom=True, use_cuckoo=True))


def test_checkpoint_storage_bounded(spark):
    """A long (budget=1, 32-superstep) crawl must not accumulate
    superseded localCheckpoint blocks: the loop's periodic GC nudge
    keeps cached state to the last few iterations (~3 frames/iter
    would be ~96 blocks unbounded; measured ~19 with cleanup)."""
    res = run_engine(
        spark,
        CrawlConfig(budget_per_host=1, max_iterations=100, use_bloom=True),
    )
    assert res.iterations >= 30  # one url per superstep on one host
    import time

    time.sleep(2)  # non-blocking cleanup drains
    n_blocks = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert n_blocks < 60, f"cached RDD state grew unbounded: {n_blocks}"


def test_host_trap_stats_flags_concentrated_hosts(spark):
    """Calendar-trap host (one prefix) and query-farm host flag
    suspect; a spread host with the same url count doesn't; small
    hosts never flag regardless of shape."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.traps import (
        host_trap_stats,
    )

    rows = (
        [(f"https://trap.ex/cal/view?d={i}", "trap.ex") for i in range(30)]
        + [(f"https://ok.ex/s{i % 10}/p/{i}", "ok.ex") for i in range(30)]
        + [(f"https://tiny.ex/cal/day?d={i}", "tiny.ex") for i in range(5)]
    )
    out = {
        r.host: r
        for r in host_trap_stats(
            spark.createDataFrame(rows, "url_norm string, host string")
        ).collect()
    }
    trap, ok, tiny = out["trap.ex"], out["ok.ex"], out["tiny.ex"]
    assert trap.suspect and trap.trap_share == 1.0 and trap.query_frac == 1.0
    assert trap.n_prefixes == 1 and trap.max_prefix_urls == 30
    assert not ok.suspect and ok.n_prefixes == 10 and ok.trap_share == 0.1
    assert not tiny.suspect  # shape is trappy but below min_urls


def test_soft404_hand_cases(spark):
    """Error phrasing behind a 200: short error bodies flag, a long
    article QUOTING an error phrase does not, clean text never does."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.traps import (
        soft404_flags,
    )

    long_quote = ("word " * 100) + "page not found"
    rows = [
        ("err1", "Page Not Found - this page does not exist."),
        ("err2", "HTTP Error 404 Not Found"),
        ("quote", long_quote),
        ("clean", "An ordinary article about nothing in particular."),
        ("empty", ""),
    ]
    out = {
        r["id"]: r
        for r in soft404_flags(
            spark.createDataFrame(rows, "url string, text string")
        ).collect()
    }
    assert out["err1"].soft404 and out["err1"].phrase_hit
    assert out["err2"].soft404
    assert out["quote"].phrase_hit and not out["quote"].soft404
    assert out["quote"].n_words == 103
    assert not out["clean"].phrase_hit and not out["clean"].soft404
    assert out["empty"].n_words == 0 and not out["empty"].soft404


def test_url_features_hand_case(spark):
    """Closed-form shape features: depth counts path slashes only,
    params count &-separated pairs, digit density is exact permille."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.traps import (
        url_features,
    )

    urls = spark.createDataFrame(
        [
            ("https://a.x/article",),
            ("https://a.x/shop/list?page=3&sort=12",),
            ("https://a.x/cal/2025/01/02?d=20250102",),
            ("https://a.x/",),
        ],
        "url_norm string",
    )
    got = {r.url_norm: r for r in url_features(urls).collect()}
    r0 = got["https://a.x/article"]
    assert (r0.path_depth, r0.n_params, r0.digit_permille) == (1, 0, 0)
    assert r0.shape_score == 90
    r1 = got["https://a.x/shop/list?page=3&sort=12"]
    assert (r1.path_depth, r1.n_params) == (2, 2)
    # digits '3' '12' -> 3 of 36 chars = 83 permille
    assert r1.digit_permille == 83
    assert r1.shape_score == 100 - 20 - 10 - 4
    r2 = got["https://a.x/cal/2025/01/02?d=20250102"]
    assert (r2.path_depth, r2.n_params) == (4, 1)
    r3 = got["https://a.x/"]
    assert (r3.path_depth, r3.n_params, r3.shape_score) == (1, 0, 90)
