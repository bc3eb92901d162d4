"""Structured-streaming frontier feed (supplementary surface)."""

import tempfile

from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.feed import (
    run_to_memory_sink,
    stream_host_rates,
)


def test_stream_host_rates(spark):
    with tempfile.TemporaryDirectory() as d:
        rows = [
            (f"https://h{i % 2}.x/p{i}", f"h{i % 2}.x", i % 5, f"2025-01-01 00:00:{i:02d}")
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, "url string, host string, depth int, ts string"
        ).withColumn("discovered_ts", F.to_timestamp("ts")).drop("ts")
        df.write.mode("overwrite").parquet(d + "/feed")

        agg = stream_host_rates(spark, d + "/feed")
        q = run_to_memory_sink(agg, "t_host_rates")
        q.awaitTermination(60)
        out = spark.sql("SELECT host, sum(discovered) AS n FROM t_host_rates GROUP BY host").collect()
        got = {r.host: r.n for r in out}
        assert got == {"h0.x": 20, "h1.x": 20}
