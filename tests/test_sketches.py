"""HyperLogLog distinct sketches (operators/sketches.py)."""

from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(F.concat(F.lit("v"), "id").alias("v"))


def test_hll_estimate_within_expected_error(spark):
    """m=1024 gives ~3.25% standard error; allow 4 sigma."""
    for n in (40, 800, 5000):
        est = hll_distinct(_ids(spark, 0, n), "v").head()["est"]
        assert abs(est - n) / n < 0.13, (n, est)


def test_hll_registers_merge_by_max(spark):
    """The sketch is MERGEABLE: register-wise max of two halves equals
    the registers of the union — the property that makes it a
    distributed aggregate."""
    a = hll_registers(_ids(spark, 0, 600), "v")
    b = hll_registers(_ids(spark, 400, 1000), "v")
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    whole = hll_registers(_ids(spark, 0, 1000), "v")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    e_m = hll_estimate(merged).head()["est"]
    e_w = hll_estimate(whole).head()["est"]
    assert e_m == e_w


def test_hll_duplicates_and_nulls_ignored(spark):
    """Cardinality, not count: duplicates leave the sketch unchanged;
    nulls drop."""
    base = _ids(spark, 0, 300)
    dup = base.unionByName(base).unionByName(base)
    with_null = dup.unionByName(
        dup.sparkSession.createDataFrame([(None,)], "v string")
    )
    e1 = hll_distinct(base, "v").head()["est"]
    e2 = hll_distinct(with_null, "v").head()["est"]
    assert e1 == e2


def test_hll_linear_counting_small_range(spark):
    """Tiny cardinalities ride the linear-counting branch and stay
    very accurate (not the ~3% raw-estimator band)."""
    row = hll_distinct(_ids(spark, 0, 15), "v").head()
    assert row["v_zero"] > 0
    assert abs(row["est"] - 15) < 1.5


def test_cms_one_sided_and_mergeable(spark):
    """CMS never undercounts; counters from two halves SUM-merge to
    the whole; exact for streams far below capacity."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )

    rows = [("hot",)] * 50 + [("warm",)] * 7 + [(f"cold{i}",) for i in range(30)]
    items = spark.createDataFrame(rows, "term string")
    counters = cms_counters(items, "term")
    terms = spark.createDataFrame(
        [("hot",), ("warm",), ("cold3",), ("absent",)], "term string"
    )
    est = {r["term"]: r["est"] for r in cms_estimate(counters, terms).collect()}
    assert est["hot"] >= 50 and est["warm"] >= 7 and est["cold3"] >= 1
    assert est["absent"] >= 0  # may collide upward, never negative
    # 87 occurrences into 4x1024 counters: collisions are essentially
    # impossible, estimates are exact
    assert est["hot"] == 50 and est["warm"] == 7 and est["cold3"] == 1

    half_a = cms_counters(items.limit(40), "term")
    import pyspark.sql.functions as F

    merged = (
        half_a.unionByName(cms_counters(items.offset(40), "term"))
        .groupBy("j", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    whole = cms_counters(items, "term")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_set_overlap_inclusion_exclusion(spark):
    """Union via register max-merge; intersection via inclusion-
    exclusion lands within the sketch error band of the true overlap."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.sketches import (
        hll_set_overlap,
    )

    a = _ids(spark, 0, 2000)
    b = _ids(spark, 1200, 3200)  # true overlap = 800
    row = hll_set_overlap(a, "v", b, "v").head()
    assert abs(row["est_a"] - 2000) / 2000 < 0.13
    assert abs(row["est_union"] - 3200) / 3200 < 0.13
    # inclusion-exclusion stacks three estimators' noise; band ~3x
    assert abs(row["est_inter"] - 800) / 800 < 0.4


def test_hyperball_on_a_path_graph(spark):
    """On the path a->b->c->d, ball estimates track the true ball
    sizes (tiny sets ride linear counting, so they're near-exact):
    |B1(a)|=2, |B2(a)|=3; the sink d stays at 1 forever."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.sketches import (
        hyperball,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src_host string, dst_host string"
    )
    out = {r["host"]: r for r in hyperball(edges, t_max=2).collect()}
    truth1 = {"a": 2, "b": 2, "c": 2, "d": 1}
    truth2 = {"a": 3, "b": 3, "c": 2, "d": 1}
    for h in truth1:
        assert abs(out[h]["est_ball_1"] - truth1[h]) < 0.5, (h, out[h])
        assert abs(out[h]["est_ball_2"] - truth2[h]) < 0.5, (h, out[h])
    # monotone: B2 >= B1 per node (register max-merge only grows)
    for h in out:
        assert out[h]["est_ball_2"] >= out[h]["est_ball_1"]
