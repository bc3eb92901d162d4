"""Exact distribution statistics for operational metrics.

The reference's stats are counters and means (``downloader/
downloader.go:51-57``, atomic ints); a scheduler throttling on mean
latency is blind to tail blowups, and Spark's own
``percentile_approx`` is neither deterministic across engines nor
exact — useless for an oracle-gated metric. This module computes
EXACT nearest-rank percentiles with a scale shape that never sorts a
raw partition:

value stream → integer milli-units → per-(key, milli) count
aggregation (map-side partials absorb the stream; the reduced table
is bounded by the VALUE SPACE, not the corpus) → cumulative count
window over that reduced table (state = one key's distinct values) →
smallest value whose cumulative count reaches the rank.

That is the repetition_stats discipline: windows only ever run over
already-reduced tables. A key with 10^10 events but millisecond
granularity latencies reaches the window as at most ~10^5 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    pcts: tuple[int, ...] = (50, 95),
    milli: int = 1000,
) -> DataFrame:
    """Per-key exact nearest-rank percentiles of ``value_col``.

    Values are committed to integer milli-units (``round(v * milli)``
    as long — the events_rollup convention) so ordering, ranking and
    the gate comparison are all integer-exact; the p-th percentile is
    the value at rank ``ceil(p/100 * n)`` of the ascending multiset
    (nearest-rank definition — deterministic, engine-independent,
    no interpolation floats).

    Output: ``(key, n, min_milli, max_milli, p<P>_milli ...)``.
    """
    m = F.round(F.col(value_col) * milli).cast("long")
    counts = (
        df.select(F.col(key_col).alias("key"), m.alias("v"))
        .groupBy("key", "v")
        .agg(F.count("*").alias("c"))
    )
    return percentiles_from_counts(counts, ["key"], pcts=pcts).withColumnRenamed(
        "key", key_col
    )


def percentiles_from_counts(
    counts: DataFrame,
    key_cols: list[str],
    v_col: str = "v",
    c_col: str = "c",
    pcts: tuple[int, ...] = (50, 95),
) -> DataFrame:
    """Nearest-rank percentiles from a PRE-REDUCED (key..., value,
    count) histogram — the shared tail of :func:`exact_percentiles`,
    split out so streaming-maintained histograms (feed.py
    stream_value_histogram keeps exactly this shape as windowed state)
    get the identical extraction."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(v_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*key_cols)
    cum = counts.withColumn("cum", F.sum(c_col).over(w)).withColumn(
        "n", F.sum(c_col).over(wn)
    )
    aggs = [
        F.max("n").cast("bigint").alias("n"),
        F.min(v_col).cast("bigint").alias("min_milli"),
        F.max(v_col).cast("bigint").alias("max_milli"),
    ]
    for p in pcts:
        # nearest-rank: ceil(p*n/100) with pure int64 arithmetic
        rank = F.expr(f"(n * {p} + 99) DIV 100")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col(v_col)))
            .cast("bigint")
            .alias(f"p{p}_milli")
        )
    return cum.groupBy(*key_cols).agg(*aggs)
