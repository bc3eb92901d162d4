"""Structured-Streaming surface (supplementary).

The reference is an unbounded crawl loop with NO event time, windows,
or late data (SURVEY.md §2.9) — the engine core is therefore
batch-iterative, not streaming. This module exists for the live
deployment shape: a discovered-URL feed streaming into the frontier
tables, with per-host windowed rate metrics (the monitor/monitor.go
dashboards as a streaming agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_host_rates(
    spark: SparkSession,
    source_dir: str,
    schema: str = "url string, host string, depth int, discovered_ts timestamp",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming per-host discovery rates over a file-source frontier
    feed: the streaming analogue of monitor.go:186-196 per-interface
    queue stats. Watermark bounds state for late arrivals."""
    feed = spark.readStream.schema(schema).parquet(source_dir)
    return (
        feed.withWatermark("discovered_ts", watermark)
        .groupBy(F.window("discovered_ts", window), F.col("host"))
        .agg(
            F.count("*").alias("discovered"),
            F.min("depth").alias("min_depth"),
        )
    )


def run_to_memory_sink(
    agg: DataFrame, name: str = "host_rates", output_mode: str = "complete"
):
    """Drive a bounded file-backed stream to completion synchronously
    (test/smoke harness); returns the started query.

    complete mode: with availableNow the whole backlog can land in one
    micro-batch, so the watermark never advances past the last window
    and append mode would emit nothing — a known bounded-replay pitfall.
    Session windows additionally reject UPDATE mode in Spark 4
    (merged sessions can't be keyed as updates) — complete is the one
    mode that drives them through a bounded replay.
    """
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    return q


def stream_seen_dedup(
    feed: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming URL-seen set: the J1 crawl-seen anti-join
    (operators/dedup.py seen_anti_join, north_rule "bloom/cuckoo
    URL-seen") in live form — each discovered URL passes exactly once,
    re-discoveries within the watermark are dropped by keyed state.

    ``dropDuplicatesWithinWatermark`` keys state by
    ``xxhash64(url_norm)`` (the same key the batch seen set and the
    Bloom shards use) and evicts entries older than the watermark —
    bounded state by contract, which is what makes a 10^10-URL live
    feed feasible: the FULL seen set lives in the batch tables; the
    stream deduplicates the re-discovery burst (the overwhelmingly
    common duplicate) and the downstream batch anti-join stays
    authoritative for the long tail. State per entry is one key hash;
    skew is host-free (hash-partitioned by key).

    Output is the projection ``(url_key, url_norm)`` — both
    functionally determined by the dedup key, so the emitted set is
    deterministic even though WHICH duplicate row wins is not.
    """
    from ..functions.urlnorm import normalize_url_compat_col

    keyed = feed.select(
        F.col("discovered_ts"),
        normalize_url_compat_col(F.col("url")).alias("url_norm"),
    ).withColumn("url_key", F.xxhash64("url_norm"))
    return (
        keyed.withWatermark("discovered_ts", watermark)
        .dropDuplicatesWithinWatermark(["url_key"])
        .select("url_key", "url_norm")
    )


def stream_value_histogram(
    spark: SparkSession,
    source_dir: str,
    schema: str = "host string, value double, ts timestamp",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    milli: int = 1000,
) -> DataFrame:
    """Streaming windowed value histogram — the state layer of live
    EXACT percentiles (operators/metrics.py discipline carried into
    Structured Streaming): per (window, host) the stream maintains
    counts per integer milli-value, so state is bounded by the VALUE
    SPACE per window per host, never the event stream, and watermark
    eviction bounds the window axis. Percentile extraction stays a
    batch query over this histogram
    (metrics.percentiles_from_counts on the sink) — the stream keeps
    the reduction hot; the dashboard pick is exact, not
    percentile_approx. The streaming twin of the latency_percentiles
    gate, and the tail-latency view the reference's atomic mean
    counters (downloader.go:51-57) cannot provide."""
    feed = spark.readStream.schema(schema).parquet(source_dir)
    return (
        feed.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window),
            F.col("host"),
            F.round(F.col("value") * milli).cast("long").alias("v"),
        )
        .agg(F.count("*").alias("c"))
    )


def stream_host_sessions(
    spark: SparkSession,
    source_dir: str,
    schema: str = "host string, ts timestamp",
    gap: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Gap-based SESSION windows per host: contiguous bursts of
    activity to one host, closed after ``gap`` idle — the live view of
    a host's fetch burst that per-interval tumbling windows
    (stream_host_rates) smear. A politeness controller reads this as
    "how long have we been hammering host H continuously"; tumbling
    windows cannot answer that because a burst straddles bucket edges.

    ``session_window`` state merges adjacent events while their
    [ts, ts+gap) ranges overlap OR TOUCH — an idle stretch of exactly
    ``gap`` still merges; a new session starts only when idle is
    strictly greater (pinned by the boundary test). Watermark eviction
    bounds state. Emitted session bounds follow Spark's contract:
    start = first event, end = last event + gap.
    """
    feed = spark.readStream.schema(schema).parquet(source_dir)
    return (
        feed.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("host"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
