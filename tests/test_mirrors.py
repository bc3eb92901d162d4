"""Mirror-host detection (operators/mirrors.py) and DUST parameter
mining (operators/traps.py dust_param_stats) — the two crawl-hygiene
miners that turn fetched content into fetch-budget savings."""

from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import (
    mirrors,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.traps import (
    dust_param_stats,
)


def _mirror_corpus(spark):
    rows = []
    # a.example and b.example: full mirrors (10 shared pages)
    for p in range(10):
        rows += [(f"a{p}", "a.example", f"CONTENT {p}"), (f"b{p}", "b.example", f"CONTENT {p}")]
    # c.example: half mirror (5 shared, 5 unique)
    for p in range(10):
        t = f"CONTENT {p}" if p % 2 == 0 else f"C-ONLY {p}"
        rows.append((f"c{p}", "c.example", t))
    # d.example: unique
    for p in range(10):
        rows.append((f"d{p}", "d.example", f"D-ONLY {p}"))
    # a parked template served by EVERY host (hot fingerprint)
    for h in "abcd":
        rows.append((f"t{h}", f"{h}.example", "TEMPLATE parked"))
    return spark.createDataFrame(rows, "doc_id string, host string, text string")


def test_host_mirror_pairs_flags_and_counts(spark):
    docs = _mirror_corpus(spark)
    got = {
        (r.host_a, r.host_b): (r.shared_fps, r.n_fps_a, r.n_fps_b, r.is_mirror)
        for r in mirrors.host_mirror_pairs(
            docs, max_hosts_per_fp=3, min_shared=2, threshold_pct=50
        ).collect()
    }
    # template fp (4 hosts > cap 3) contributes to NO pair; sizes count it
    assert got[("a.example", "b.example")] == (10, 11, 11, True)
    # c shares 5 of 11/11: jaccard 5/17 < 0.5 -> pair listed, not mirror
    assert got[("a.example", "c.example")] == (5, 11, 11, False)
    assert got[("b.example", "c.example")] == (5, 11, 11, False)
    # d shares only the capped template -> no pair at all
    assert not any("d.example" in k for k in got)


def test_mirror_cap_audit(spark):
    docs = _mirror_corpus(spark)
    r = mirrors.mirror_cap_audit(docs, max_hosts_per_fp=3).head()
    # distinct fps: CONTENT 0..9 (10) + C-ONLY odd (5) + D-ONLY (10) + template
    assert r.n_fps == 26
    assert r.n_capped == 1  # exactly the template
    assert r.max_fp_hosts == 4


def test_mirror_representatives_min_host_rule(spark):
    docs = _mirror_corpus(spark)
    pairs = mirrors.host_mirror_pairs(docs, max_hosts_per_fp=3)
    reps = {r.host: r.representative for r in mirrors.mirror_representatives(pairs).collect()}
    # the a<->b family collapses to its smallest member
    assert reps == {"a.example": "a.example", "b.example": "a.example"}


def test_dust_param_stats_learns_irrelevance(spark):
    rows = []
    for p in range(4):
        for s in range(3):  # session id: content-irrelevant
            for v in range(2):  # variant: drives content
                rows.append(
                    (
                        f"https://shop.example/item?page={p}&sess=s{s}&v={v}",
                        f"ITEM {p} v{v}",
                    )
                )
    pages = spark.createDataFrame(rows, "url string, text string")
    got = {r.param: r for r in dust_param_stats(pages, min_urls=6).collect()}
    assert set(got) == {"page", "sess", "v"}
    sess = got["sess"]
    assert (sess.n_urls, sess.n_groups, sess.n_contents) == (24, 8, 8)
    assert sess.irrelevant
    v = got["v"]  # buckets of 2, contents 2 each -> fully relevant
    assert (v.n_urls, v.n_groups, v.n_contents) == (24, 12, 24)
    assert not v.irrelevant
    page = got["page"]
    assert (page.n_urls, page.n_groups, page.n_contents) == (24, 6, 24)
    assert not page.irrelevant


def test_dust_duplicate_fetches_do_not_inflate(spark):
    rows = [("https://h.example/a?x=1", "T"), ("https://h.example/a?x=1", "T"),
            ("https://h.example/a?x=2", "T"), ("https://h.example/a?x=3", "T"),
            ("https://h.example/a?x=4", "T"), ("https://h.example/a?x=5", "T"),
            ("https://h.example/a?x=6", "T")]
    pages = spark.createDataFrame(rows, "url string, text string")
    r = dust_param_stats(pages, min_urls=6).head()
    assert r.n_urls == 6  # the repeat fetch collapsed
    assert r.irrelevant


def test_strip_learned_params_collapses_families(spark):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.traps import (
        strip_learned_params,
    )

    rows = []
    for p in range(4):
        for s in range(3):
            for v in range(2):
                rows.append(
                    (
                        f"https://shop.example/item?page={p}&sess=s{s}&v={v}",
                        f"ITEM {p} v{v}",
                    )
                )
    pages = spark.createDataFrame(rows, "url string, text string")
    rules = dust_param_stats(pages, min_urls=6)
    out = strip_learned_params(pages.select("url").distinct(), rules)
    canon = {r.url_canon for r in out.collect()}
    # sess stripped, page+v kept sorted: 24 urls collapse to 8 keys
    assert canon == {
        f"https://shop.example/item?page={p}&v={v}" for p in range(4) for v in range(2)
    }
    assert out.count() == 24  # one row per input url


def test_strip_learned_params_passthrough(spark):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.traps import (
        strip_learned_params,
    )

    urls = spark.createDataFrame(
        [
            ("https://other.example/a?z=1&a=2",),  # host with no rules
            ("https://other.example/plain",),  # no query at all
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [("shop.example", "sess", True)], "host string, param string, irrelevant boolean"
    )
    got = {r.url: r.url_canon for r in strip_learned_params(urls, rules).collect()}
    assert got["https://other.example/a?z=1&a=2"] == "https://other.example/a?a=2&z=1"
    assert got["https://other.example/plain"] == "https://other.example/plain"


def test_dust_no_query_urls_contribute_nothing(spark):
    pages = spark.createDataFrame(
        [("https://h.example/a", "T1"), ("https://h.example/b", "T2")],
        "url string, text string",
    )
    assert dust_param_stats(pages, min_urls=1).count() == 0
