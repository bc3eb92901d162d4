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


def test_stream_seen_dedup_single_batch(spark):
    """One availableNow batch: each distinct normalized URL passes
    exactly once, fragments/queries collapse onto their base URL."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.feed import (
        stream_seen_dedup,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.stateful import (
        run_bounded,
    )

    with tempfile.TemporaryDirectory() as d:
        rows = [
            ("http://a.x/p", "2026-01-01 00:00:00"),
            ("http://a.x/p#frag", "2026-01-01 00:00:01"),
            ("http://a.x/p?q=1", "2026-01-01 00:00:02"),
            ("HTTP://A.X/q", "2026-01-01 00:00:03"),
            ("http://a.x/q", "2026-01-01 00:00:04"),
            ("http://b.x/r", "2026-01-01 00:00:05"),
        ]
        spark.createDataFrame(rows, "url string, ts string").selectExpr(
            "url", "CAST(ts AS timestamp) AS discovered_ts"
        ).coalesce(1).write.parquet(d + "/feed")
        feed = spark.readStream.schema(
            "url string, discovered_ts timestamp"
        ).parquet(d + "/feed")
        q = run_bounded(stream_seen_dedup(feed, watermark="1 hour"), "t_seen1")
        q.awaitTermination(120)
        out = sorted(r.url_norm for r in spark.sql("SELECT * FROM t_seen1").collect())
        assert out == ["http://a.x/p", "http://a.x/q", "http://b.x/r"]


def test_stream_seen_dedup_state_survives_and_evicts(spark):
    """Across micro-batches (maxFilesPerTrigger=1, file mtimes pinned):
    a re-discovery in batch 2 INSIDE the watermark is dropped (state
    survived the boundary); a re-discovery in batch 3 arriving after
    the watermark passed the key's eviction point is re-emitted —
    dropDuplicatesWithinWatermark's documented bounded-state
    contract, which is exactly why a 10^10-URL live feed is feasible
    (the batch anti-join stays authoritative for the long tail)."""
    import os

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.feed import (
        stream_seen_dedup,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.stateful import (
        run_bounded,
    )

    def _write(d, name, rows, mtime):
        tmp = d + "/tmp_" + name
        spark.createDataFrame(rows, "url string, ts string").selectExpr(
            "url", "CAST(ts AS timestamp) AS discovered_ts"
        ).coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.makedirs(d + "/feed", exist_ok=True)
        dst = d + "/feed/" + name + ".parquet"
        os.rename(tmp + "/" + part, dst)
        os.utime(dst, (mtime, mtime))

    with tempfile.TemporaryDirectory() as d:
        # batch 1: first sighting of /p at t=0
        _write(d, "000", [("http://a.x/p", "2026-01-01 00:00:00")], 1_700_000_000)
        # batch 2: re-discovery at t=+30s — watermark (1 min) has not
        # passed t0+1min, state alive -> dropped
        _write(d, "001", [("http://a.x/p", "2026-01-01 00:00:30")], 1_700_000_100)
        # batch 3: advance event time far past /p's expiry. Eviction is
        # LAZY: the in-effect watermark lags one batch and expired
        # state is only reaped at the end of the batch where the lagged
        # watermark passes it — so batch 4's /p still matches
        # expired-but-unevicted state and is dropped, and only batch
        # 5's /p (state reaped at batch 4's end) is re-emitted.
        _write(d, "002", [("http://a.x/other", "2026-01-01 01:00:00")], 1_700_000_200)
        _write(d, "003", [("http://a.x/p", "2026-01-01 01:00:01")], 1_700_000_300)
        _write(d, "004", [("http://a.x/p", "2026-01-01 01:00:02")], 1_700_000_400)
        feed = (
            spark.readStream.schema("url string, discovered_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/feed")
        )
        q = run_bounded(stream_seen_dedup(feed, watermark="1 minute"), "t_seen2")
        q.awaitTermination(240)
        out = [r.url_norm for r in spark.sql("SELECT * FROM t_seen2").collect()]
        assert sorted(out) == [
            "http://a.x/other",
            "http://a.x/p",
            "http://a.x/p",  # re-emitted after eviction: twice total
        ]


def test_stream_value_histogram_exact_percentiles(spark):
    """The streamed windowed histogram + batch nearest-rank extraction
    equals the hand answer: 10 values 1..10 in one window -> p50=5000,
    p95=10000; a second window holds one value."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.metrics import (
        percentiles_from_counts,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.feed import (
        stream_value_histogram,
    )

    with tempfile.TemporaryDirectory() as d:
        rows = [("h.x", float(i + 1), f"2025-01-01 00:00:0{i % 10}") for i in range(10)]
        rows += [("h.x", 42.0, "2025-01-01 00:01:00")]
        df = spark.createDataFrame(rows, "host string, value double, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        df.write.mode("overwrite").parquet(d + "/feed")

        hist = stream_value_histogram(spark, d + "/feed")
        q = run_to_memory_sink(hist, "t_latency_hist")
        q.awaitTermination(60)
        sink = spark.table("t_latency_hist").select(
            F.col("window.start").cast("long").alias("w"), "host", "v", "c"
        )
        got = {r.w: r for r in percentiles_from_counts(sink, ["w", "host"]).collect()}
        wins = sorted(got)
        first, second = got[wins[0]], got[wins[1]]
        assert (first.n, first.p50_milli, first.p95_milli) == (10, 5000, 10000)
        assert (second.n, second.p50_milli, second.max_milli) == (1, 42000, 42000)


def test_stream_host_sessions_gap_boundary(spark):
    """Session merge/split at the exact gap boundary: idle < gap merges,
    idle == gap starts a new session; bounds = [first, last + gap)."""
    import shutil

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.streaming.feed import (
        stream_host_sessions,
    )

    rows = [
        # host a: idle == gap (00:30 -> 02:30) still MERGES (Spark
        # merges boundary-touching sessions); idle < gap merges too
        ("a", "2025-01-01 00:00:00"),
        ("a", "2025-01-01 00:30:00"),
        ("a", "2025-01-01 02:30:00"),
        ("a", "2025-01-01 04:29:59"),
        # 1 us past the gap after 04:29:59 -> strictly greater -> split
        ("a", "2025-01-01 06:29:59.000001"),
        # host b: single event
        ("b", "2025-01-01 05:00:00"),
    ]
    feed_dir = tempfile.mkdtemp(prefix="sess_")
    (
        spark.createDataFrame(rows, "host string, t string")
        .select("host", F.to_timestamp("t").alias("ts"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(feed_dir)
    )
    agg = stream_host_sessions(spark, feed_dir, gap="2 hours")
    q = run_to_memory_sink(agg, name="sess_test", output_mode="complete")
    q.awaitTermination()
    shutil.rmtree(feed_dir, ignore_errors=True)
    out = spark.sql(
        "SELECT host, CAST(session_window.start AS STRING) AS s,"
        " CAST(session_window.end AS STRING) AS e, n_events"
        " FROM sess_test ORDER BY host, s"
    ).collect()
    got = [(r["host"], r["s"], r["e"], r["n_events"]) for r in out]
    assert got == [
        ("a", "2025-01-01 00:00:00", "2025-01-01 06:29:59", 4),
        ("a", "2025-01-01 06:29:59.000001", "2025-01-01 08:29:59.000001", 1),
        ("b", "2025-01-01 05:00:00", "2025-01-01 07:00:00", 1),
    ]
