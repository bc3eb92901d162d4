"""Snapshot checkpointing for the frontier loop (north_rule: resumable
with per-partition lineage + metrics).

The reference's only persistence is three append-only text files
written by racing goroutines (crawler_twotier.go:237-244,
downloader.go:302-310) — unordered and unusable for resume. Here each
iteration commits an atomic snapshot:

    <dir>/seen/iter=K/*.parquet        (append-only: new URLs of iter K)
    <dir>/frontier/iter=K/*.parquet    (full frontier entering iter K+1)
    <dir>/downloads/iter=K/*.parquet   (download-state delta of iter K)
    <dir>/pending/iter=K/*.parquet     (full retry queue after iter K)
    <dir>/metrics/iter=K/*.parquet     (per-partition fetch metrics)
    <dir>/_meta.json                   (latest committed iteration)

``downloads`` deltas are MERGE-shaped: the state machine closes each
url exactly once (J2 anti-joins the log), so the deltas are disjoint
and their union IS the merged downloads table — the same final state
an Iceberg ``MERGE INTO`` of each delta would produce, with the
append + commit-pointer discipline standing in for the snapshot
commit. ``merged_downloads`` is that read-side merge view; ``pending``
is a full (small) snapshot per iteration, like ``frontier``.

``_meta.json`` is written last (rename-into-place), so a crash mid-
iteration leaves the previous snapshot authoritative — the same
commit-pointer discipline an Iceberg snapshot gives; on a cluster this
class is swapped for Iceberg ``MERGE INTO``/append on the same
schemas (the table layout IS Iceberg-partition-shaped: hive-style
``iter=K`` directories). Resume = read all ``seen`` iters ≤ K and the
``frontier`` of K.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- commit -------------------------------------------------------------

    def write_iter(
        self,
        it: int,
        seen_delta: DataFrame,
        frontier: DataFrame,
        downloads_delta: DataFrame | None = None,
        metrics: DataFrame | None = None,
        downloads_pending: DataFrame | None = None,
    ) -> None:
        seen_delta.write.mode("overwrite").parquet(f"{self.root}/seen/iter={it}")
        frontier.write.mode("overwrite").parquet(f"{self.root}/frontier/iter={it}")
        if downloads_delta is not None:
            downloads_delta.write.mode("overwrite").parquet(
                f"{self.root}/downloads/iter={it}"
            )
        if downloads_pending is not None:
            downloads_pending.write.mode("overwrite").parquet(
                f"{self.root}/pending/iter={it}"
            )
        if metrics is not None:
            metrics.write.mode("overwrite").parquet(f"{self.root}/metrics/iter={it}")
        self._commit_meta(it)

    def _commit_meta(self, it: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json")
        with os.fdopen(fd, "w") as f:
            json.dump({"iter": it}, f)
        os.replace(tmp, f"{self.root}/_meta.json")  # atomic commit pointer

    # -- resume -------------------------------------------------------------

    def latest_iter(self) -> int | None:
        meta = f"{self.root}/_meta.json"
        if not os.path.exists(meta):
            return None
        with open(meta) as f:
            return json.load(f)["iter"]

    def read_seen(self, spark: SparkSession, upto: int) -> DataFrame:
        paths = [
            f"{self.root}/seen/iter={k}"
            for k in range(upto + 1)
            if os.path.isdir(f"{self.root}/seen/iter={k}")
        ]
        return spark.read.parquet(*paths)

    def read_frontier(self, spark: SparkSession, it: int) -> DataFrame:
        return spark.read.parquet(f"{self.root}/frontier/iter={it}")

    def read_downloads(self, spark: SparkSession, upto: int) -> DataFrame | None:
        paths = [
            f"{self.root}/downloads/iter={k}"
            for k in range(upto + 1)
            if os.path.isdir(f"{self.root}/downloads/iter={k}")
        ]
        return spark.read.parquet(*paths) if paths else None

    def merged_downloads(self, spark: SparkSession, upto: int) -> DataFrame | None:
        """Read-side MERGE view of the downloads table: deltas are
        disjoint on ``url`` (the state machine closes each url exactly
        once), so the union of deltas equals the Iceberg-MERGEd table.
        Alias of read_downloads, named for the semantic contract."""
        return self.read_downloads(spark, upto)

    def read_pending(self, spark: SparkSession, it: int) -> DataFrame | None:
        """Latest retry-queue snapshot at or before ``it`` (the queue
        only changes on iterations that ran the download machine)."""
        for k in range(it, -1, -1):
            if os.path.isdir(f"{self.root}/pending/iter={k}"):
                return spark.read.parquet(f"{self.root}/pending/iter={k}")
        return None
