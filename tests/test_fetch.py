"""Tier-2 fetch-and-extract (operators/fetch.py — M7, SURVEY.md §3.3)."""

from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import fetch


def _corpus(spark):
    rows = [
        ("https://h0.example/a", "<html><head><title>T</title></head><body><p>hello world</p></body></html>"),
        ("https://h0.example/b", "<html><body>plain <b>bold</b> tail</body></html>"),
        ("https://h1.example/c", "<html><body></body></html>"),
    ]
    return spark.createDataFrame(rows, "url_norm string, html string")


def _queue(spark):
    rows = [
        ("https://h0.example/a", "h0.example"),
        ("https://h0.example/b", "h0.example"),
        ("https://h1.example/c", "h1.example"),
        ("https://h1.example/missing", "h1.example"),
    ]
    return spark.createDataFrame(rows, "url string, host string")


def test_extract_text_scalar():
    assert fetch.extract_text_py("<html><body><p>a<b>b</b>c</p></body></html>") == "abc"
    assert fetch.extract_text_py("<p>x &amp; y</p>") == "x & y"
    assert fetch.extract_text_py(b"<p>bytes</p>") == "bytes"
    assert fetch.extract_text_py(None) is None


def test_fetch_and_extract_status_and_text(spark):
    out = {r.url: r for r in fetch.fetch_and_extract(_queue(spark), _corpus(spark)).collect()}
    assert out["https://h0.example/a"].status == 200
    assert out["https://h0.example/a"].text == "Thello world"
    assert out["https://h0.example/b"].text == "plain bold tail"
    assert out["https://h1.example/c"].text == ""
    assert out["https://h1.example/missing"].status == 404
    assert out["https://h1.example/missing"].text is None
    assert out["https://h1.example/missing"].n_bytes == 0
    assert out["https://h0.example/b"].n_bytes == len(
        "<html><body>plain <b>bold</b> tail</body></html>"
    )


def test_fetch_metrics_rollup(spark):
    fetched = fetch.fetch_and_extract(_queue(spark), _corpus(spark))
    m = fetch.fetch_metrics(fetched).agg(
        F.sum("attempts").alias("a"),
        F.sum("success").alias("s"),
        F.sum("failed").alias("f"),
        F.sum("bytes").alias("b"),
    ).collect()[0]
    assert (m.a, m.s, m.f) == (4, 3, 1)
    assert m.b > 0


def test_salted_repartition_spreads_megahost(spark):
    """A single mega-host must land on >1 partition when salted."""
    rows = [(f"https://mega.example/p{i}", "mega.example") for i in range(200)]
    df = spark.createDataFrame(rows, "url string, host string")
    parts = (
        fetch.salted_host_repartition(df, salts=8, partitions=8)
        .withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )
    assert parts > 1
