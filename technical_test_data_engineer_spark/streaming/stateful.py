"""Custom stateful streaming operator (applyInPandasWithState).

The built-in windowed aggregations cover time-bucketed rollups; this is
the extension point for semantics they can't express — here, per-user
lifetime counters maintained across micro-batches (the streaming
version of a running total that never re-reads history).

State design for scale: state lives in the executor state store keyed
by user_id — O(distinct users) entries of 3 numbers each, NOT O(events).
Arrow moves each group's batch rows to Python in one block, so the
Python cost is per-batch-per-user, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            # ts arrives as datetime64[ns] (or us); track max as µs epoch
            batch_max = pd.Timestamp(pdf["ts"].max()).value // 1000
            last_us = max(last_us, batch_max)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts_us": [last_us],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime (n_events, total_value, last_ts) maintained in
    the state store; emits the updated row for every user seen in each
    micro-batch (Update output mode)."""
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
