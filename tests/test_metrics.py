"""Exact percentile statistics (operators/metrics.py)."""

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.metrics import (
    exact_percentiles,
)


def test_exact_percentiles_hand_case(spark):
    """10 values 1..10 (as 1000..10000 milli): nearest-rank p50 =
    rank ceil(5.0)=5 -> 5000, p95 = rank ceil(9.5)=10 -> 10000."""
    rows = [("a", float(i)) for i in range(1, 11)] + [("b", 7.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    got = {r.k: r for r in exact_percentiles(df, "k", "value").collect()}
    a = got["a"]
    assert (a.n, a.min_milli, a.max_milli) == (10, 1000, 10000)
    assert (a.p50_milli, a.p95_milli) == (5000, 10000)
    b = got["b"]  # single value: every percentile is it
    assert (b.n, b.p50_milli, b.p95_milli) == (1, 7000, 7000)


def test_exact_percentiles_duplicates_and_skew(spark):
    """A hot value dominating the multiset pins the percentiles
    exactly where the sorted multiset says (no interpolation): 97
    copies of 2.0 + one each of 1.0/3.0/4.0 -> p50=p95=2000."""
    rows = [("h", 2.0)] * 97 + [("h", 1.0), ("h", 3.0), ("h", 4.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    r = exact_percentiles(df, "k", "value").head()
    assert (r.n, r.p50_milli, r.p95_milli, r.max_milli) == (100, 2000, 2000, 4000)
