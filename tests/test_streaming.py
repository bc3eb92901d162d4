"""Structured-streaming frontier feed (supplementary surface)."""

import tempfile

from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.feed import (
    run_to_memory_sink,
    stream_host_rates,
)


def _feed_rows(spark, lo, hi):
    rows = [
        (f"https://h{i % 2}.x/p{i}", f"h{i % 2}.x", f"2025-01-01 00:00:{i:02d}")
        for i in range(lo, hi)
    ]
    return (
        spark.createDataFrame(rows, "url string, host string, ts string")
        .withColumn("discovered_ts", F.to_timestamp("ts"))
        .drop("ts")
    )


def test_streaming_host_budget_single_batch(spark):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.stateful import (
        run_bounded,
        streaming_host_budget,
    )

    with tempfile.TemporaryDirectory() as d:
        _feed_rows(spark, 0, 20).write.mode("overwrite").parquet(d + "/feed")
        feed = spark.readStream.schema(
            "url string, host string, discovered_ts timestamp"
        ).parquet(d + "/feed")
        q = run_bounded(streaming_host_budget(feed, budget_per_host=7), "t_budget1")
        q.awaitTermination(120)
        out = spark.sql("SELECT * FROM t_budget1").collect()
        assert len(out) == 20
        by_host = {}
        for r in sorted(out, key=lambda r: (r.host, r.seq)):
            by_host.setdefault(r.host, []).append(r)
        for host, rs in by_host.items():
            assert [r.seq for r in rs] == list(range(1, 11))  # dense per-host seq
            assert [r.scheduled for r in rs] == [True] * 7 + [False] * 3
            # seq follows (discovered_ts, url) order: ts encodes i here
            ids = [int(r.url.rsplit("p", 1)[1]) for r in rs]
            assert ids == sorted(ids)


def test_streaming_host_budget_state_survives_microbatches(spark):
    """budget counts span micro-batch boundaries: file 2's rows continue
    the per-host sequence started by file 1 (maxFilesPerTrigger=1)."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.stateful import (
        run_bounded,
        streaming_host_budget,
    )

    with tempfile.TemporaryDirectory() as d:
        _feed_rows(spark, 0, 10).coalesce(1).write.parquet(d + "/feed/a")
        _feed_rows(spark, 10, 20).coalesce(1).write.parquet(d + "/feed/b")
        feed = (
            spark.readStream.schema(
                "url string, host string, discovered_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/feed/*")
        )
        q = run_bounded(streaming_host_budget(feed, budget_per_host=7), "t_budget2")
        q.awaitTermination(120)
        out = spark.sql("SELECT * FROM t_budget2").collect()
        assert len(out) == 20
        for host in ("h0.x", "h1.x"):
            seqs = sorted(r.seq for r in out if r.host == host)
            assert seqs == list(range(1, 11))  # no restart at batch 2
            n_sched = sum(r.scheduled for r in out if r.host == host)
            assert n_sched == 7


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
