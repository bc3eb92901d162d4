"""Download-state machine — S6 download log, J2 raw-key dedup, J3/C5
retry accounting (SURVEY.md §2).

The reference's downloader keeps an in-memory ``map[string]*DownloadState``
keyed on the RAW document URL (downloader.go:280-286) guarded by a
mutex; a worker pops a URL, fetches it, and either records success or
bumps ``FailedCount`` and re-enqueues until the retry cap
(config/config.go:34). Here the same machine is a per-superstep
DataFrame transition driven by the frontier loop (plans/frontier.py),
with retries as DATA (a ``retry`` column) instead of re-enqueues:

    state(it) = (pending, log);  input = new_docs(it), corpus keys
    attempts  = pending ∪ (new_docs \\ log \\ pending)   [J2, raw key]
    hit       = attempts ⋉ corpus on normalize(url)      [S2 lookup fetch]
    done      = hit                 → log(status=done, iter=it)
    missed    = attempts \\ hit     → retry += 1          [J3/C5]
    failed    = missed where retry > max_retries → log(status=failed)
    pending'  = missed where retry ≤ max_retries

Determinism: the reference's outcome depends on goroutine scheduling
only in WHEN a retry happens, never in the final (url → status) map;
the superstep transition reproduces exactly that final map, with
``iter`` as the deterministic replacement for wall-clock ordering.

Scale: every step is a key shuffle on ``url`` (or a broadcast when the
per-iteration doc batch is small, which politeness budgets guarantee);
no state ever reaches the driver. ``log`` grows append-only and is
snapshotted per iteration (plans/checkpoint.py) — the 10^10-scale
variant keeps it as an Iceberg table and MERGEs the delta.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urlnorm import normalize_url_compat_col

LOG_SCHEMA = "url string, status string, retry int, iter int"
PENDING_SCHEMA = "url string, retry int"


def advance_download_state(
    new_docs: DataFrame,
    pending: DataFrame,
    log: DataFrame,
    corpus_keys: DataFrame,
    it: int,
    max_retries: int,
    norm: "Column | None" = None,
) -> tuple[DataFrame, DataFrame]:
    """One superstep of the download log.

    Args:
        new_docs: raw doc URLs discovered this iteration — column ``url``
            (duplicates allowed; deduped here on the RAW key, J2).
        pending: carry-over retry queue ``(url, retry)``.
        log: closed entries ``(url, status, retry, iter)``.
        corpus_keys: one column ``dl_norm`` — the normalized URL keys the
            fetch tier can serve (keys-only projection; never the bytes).
        it: current iteration number (recorded on closing entries).
        max_retries: C5 cap — a URL missing on attempt ``retry`` with
            ``retry > max_retries`` closes as ``failed``.
        norm: optional normalization expression applied to ``url`` for
            the fetch probe (default: the P1 compat normalizer).

    Returns:
        ``(delta, pending')`` — ``delta`` holds this iteration's closing
        rows (``done`` | ``failed``) in LOG_SCHEMA shape; ``pending'``
        is the next retry queue. The caller owns unioning ``delta`` into
        its log and checkpointing both.
    """
    if norm is None:
        norm = normalize_url_compat_col(F.col("url"))

    fresh = (
        new_docs.select("url")
        .dropDuplicates(["url"])  # raw-URL key (downloader.go:280-286)
        .join(log.select("url"), "url", "left_anti")
        .join(pending.select("url"), "url", "left_anti")
        .withColumn("retry", F.lit(0))
    )
    attempts = pending.unionByName(fresh)

    # fetch-success test needs only key existence — probe a keys-only
    # projection of the corpus, never the html bytes
    probed = attempts.join(
        corpus_keys.select("dl_norm", F.lit(True).alias("dl_hit")),
        norm == F.col("dl_norm"),
        "left",
    )
    done = probed.filter(F.col("dl_hit").isNotNull()).select(
        "url", F.lit("done").alias("status"), "retry", F.lit(it).alias("iter")
    )
    missed = probed.filter(F.col("dl_hit").isNull()).select(
        "url", (F.col("retry") + 1).alias("retry")
    )
    failed = missed.filter(F.col("retry") > max_retries).select(
        "url", F.lit("failed").alias("status"), "retry", F.lit(it).alias("iter")
    )
    next_pending = missed.filter(F.col("retry") <= max_retries)
    return done.unionByName(failed), next_pending


def finalize_download_log(
    log: DataFrame, pending: DataFrame, it: int
) -> DataFrame:
    """Drain-time view (C6): close the log with still-pending rows
    marked ``pending`` at the final iteration."""
    pending_final = pending.select(
        "url", F.lit("pending").alias("status"), "retry", F.lit(it).alias("iter")
    )
    return log.unionByName(pending_final)
