"""Stateful streaming politeness scheduler — ``applyInPandasWithState``.

The batch scheduler (:mod:`..operators.schedule`) replays per-host clocks
from the hosts snapshot each round. In a continuous deployment the
frontier arrives as a stream of candidates; the per-host next-allowed
clock then lives in Structured Streaming **group state**, carried across
micro-batches and restarts by the state store (the custom-stateful-
operator path the batch engine never needs).

Semantics per host (identical to the batch W1 window):

    seq          = cumulative admitted count (state) + rank within batch
    scheduled_ts = max(state clock, batch floor) + (rank-1) * delay
    state clock += admitted * delay

Rows within one micro-batch are ordered (priority, url_hash) — the same
total order as the batch scheduler, so a stream fed round-by-round
produces the batch schedule exactly (tested).

Scale shape: state is O(|active hosts|) tiny fixed-width rows, sharded
by the state store across partitions; each micro-batch shuffles only the
candidate rows on host (the same shuffle the batch window needs).
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CANDIDATE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("delay_ms", T.LongType(), False),
        T.StructField("floor_ts", T.TimestampType(), False),
    ]
)

SCHEDULED = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host_seq", T.LongType(), False),
        T.StructField("scheduled_ts", T.TimestampType(), False),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("next_allowed_us", T.LongType(), False),
        T.StructField("total_seq", T.LongType(), False),
    ]
)

_EPOCH = datetime(1970, 1, 1)


def _schedule_group(key, pdfs, state: GroupState):
    """Per-host stateful kernel: one call per (host, micro-batch)."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        next_allowed_us, total_seq = state.get
    else:
        next_allowed_us, total_seq = None, 0
    batch = batch.sort_values(["priority", "url_hash"], kind="mergesort")
    delay_us = int(batch["delay_ms"].iloc[0]) * 1000
    floor_us = int(
        (batch["floor_ts"].iloc[0].to_pydatetime() - _EPOCH).total_seconds() * 1_000_000
    )
    base_us = max(next_allowed_us or 0, floor_us)
    n = len(batch)
    seqs = [total_seq + i + 1 for i in range(n)]
    ts = [base_us + i * delay_us for i in range(n)]
    state.update((base_us + n * delay_us, total_seq + n))
    yield pd.DataFrame(
        {
            "host": batch["host"].values,
            "url": batch["url"].values,
            "url_hash": batch["url_hash"].values,
            "host_seq": seqs,
            "scheduled_ts": pd.to_datetime(ts, unit="us"),
        }
    )


def streaming_politeness(candidates: DataFrame) -> DataFrame:
    """Continuous politeness scheduling over a candidate stream (schema
    :data:`CANDIDATE`). Returns the scheduled stream (append mode)."""
    return candidates.groupBy("host").applyInPandasWithState(
        _schedule_group,
        outputStructType=SCHEDULED,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
