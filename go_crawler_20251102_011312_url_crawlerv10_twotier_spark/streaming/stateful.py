"""Custom stateful streaming operator: per-host politeness budget over
a live discovered-URL feed (C1/C2 as a stream — SURVEY.md §2.7/§2.9).

The batch engine enforces politeness per superstep
(operators/politeness.py); a live deployment sees URLs as an unbounded
stream. This operator keys the stream by host and carries ONE integer
of state per host — how many URLs that host has ever had scheduled —
via ``applyInPandasWithState``, assigning each URL a per-host sequence
number and a ``scheduled`` verdict (seq <= budget). The budget spans
the host's lifetime across micro-batches, which is exactly what a
windowless crawl cap means (the reference's per-queue cap,
colly queue + PersistentEnqueue backpressure, crawler_twotier.go).

Scale: state is one int per distinct host, partitioned by the
groupBy(host) shuffle — 10^8 hosts is a few GB of state spread over
the cluster, far below the executor state-store budget. Skewed hosts
cost ordering work within their group only (a mega-host's batch slice
sorts in one task — the same bound the salted batch operator solves;
at stream rates a single host's per-batch slice is politeness-small
by construction).

Determinism contract: within a micro-batch, rows of a host are
ordered by (discovered_ts, url) before numbering; across batches,
ordering is arrival order. A bounded replay driven as ONE availableNow
batch is therefore byte-deterministic and equals the batch
``row_number() OVER (PARTITION BY host ORDER BY ts, url)`` —
the oracle the driver gate checks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("scheduled", T.BooleanType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("cnt", T.IntegerType())])


def _budget_fn(budget: int):
    def fn(key, pdf_iter, state: GroupState):
        cnt = state.get[0] if state.exists else 0
        # one concat per (host, micro-batch): Arrow hands the group in
        # chunks, and the (ts, url) order must hold across ALL of them.
        # Memory bound = one host's slice of one micro-batch —
        # politeness-small by construction in a crawl feed.
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["discovered_ts", "url"], kind="mergesort")
        n = len(pdf)
        seqs = pd.RangeIndex(cnt + 1, cnt + n + 1)
        cnt += n
        state.update((cnt,))
        yield pd.DataFrame(
            {
                "host": pdf["host"].to_numpy(),
                "url": pdf["url"].to_numpy(),
                "seq": seqs.to_numpy("int32"),
                "scheduled": seqs.to_numpy() <= budget,
            }
        )

    return fn


def streaming_host_budget(feed: DataFrame, budget_per_host: int) -> DataFrame:
    """Apply the lifetime per-host budget to a streaming feed with
    columns (url, host, discovered_ts, ...). Returns (host, url, seq,
    scheduled) — callers route scheduled=False rows to a deferral
    sink, mirroring the batch operator's defer-not-drop contract."""
    return feed.groupBy("host").applyInPandasWithState(
        _budget_fn(budget_per_host),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_bounded(agg: DataFrame, name: str):
    """Drive a bounded file-backed stateful stream to completion into a
    memory sink (availableNow). To force multi-micro-batch replay —
    state surviving batch boundaries — set
    ``.option("maxFilesPerTrigger", 1)`` on the readStream source
    (tests/test_streaming.py does)."""
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    return q
