"""Training-shard sink: the write side of the corpus refinery.

After corpus_refine produces (doc_id, stratum, n_tokens, weight), a
tokenizer wants the corpus as stratum-partitioned parquet shards of
bounded size, plus a manifest it can schedule from without listing
files. This sink is deliberately plain Spark — partitionBy for the
directory layout, maxRecordsPerFile for the shard bound — because at
100 TB those are the two knobs that matter and both are executed
distributed (no driver-side file juggling).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    stratum_col: str = "stratum",
    max_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Write ``df`` as ``path/{stratum_col}=X/part-*.parquet`` with at
    most ``max_records_per_file`` rows per shard, then write a
    ``_manifest`` parquet next to it (one row per stratum: docs,
    tokens, weighted tokens) computed from a RE-READ of the written
    files — the manifest certifies what landed on disk, not what the
    input plan claimed.

    Returns the manifest DataFrame.

    Scale notes: ``repartition(stratum)`` before ``partitionBy`` keeps
    every task writing to ONE directory (without it, each of the W
    input tasks opens a file per stratum → W×S small files);
    ``maxRecordsPerFile`` then re-splits oversized strata inside the
    task, which is how the per-shard bound holds without a second
    shuffle. A skewed stratum (English is always >50 %) therefore
    lands on one task — callers with that profile should salt:
    ``repartition(N, stratum, pmod(hash(doc_id), N))`` keeps both the
    directory layout and the parallelism. Manifest aggregation is one
    map-side-partial groupBy over the re-read.
    """
    (
        df.repartition(F.col(stratum_col))
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(stratum_col)
        .mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    # explicit schema: a refined corpus can legitimately be EMPTY at
    # tiny scale (every doc filtered), which writes zero part files —
    # an inference-based read would die instead of certifying an
    # empty manifest (same discipline as plans/pipeline._StageRunner)
    written = spark.read.schema(df.schema).parquet(path)
    # weighted tokens summed in integer micro-units: float sums are
    # partition-order-dependent, and a manifest that certifies files
    # must not depend on who read them in what order
    micro = F.round(F.col("weight") * 1000000).cast("long") * F.col("n_tokens")
    manifest = written.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.sum(micro) / F.lit(1000000.0)).alias("weighted_tokens"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest")
    )
    return spark.read.parquet(os.path.join(path, "_manifest"))
