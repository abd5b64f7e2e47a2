"""Custom stateful streaming operator — applyInPandasWithState.

The shape for operators Structured Streaming's built-in aggregations
can't express: arbitrary per-key state evolved across micro-batches
(SURVEY §2.8 names flatMapGroupsWithState as the BDA-as-stream path;
this is its PySpark face). Demonstrated here as a per-user running
accumulator over the events stream — the same mechanics (explicit state
schema, per-key pandas batches, update-mode emission) carry a stateful
greedy binner or decorrelation budget tracker.
"""

from __future__ import annotations

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
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update(key, pdf_iter, state: GroupState):
    """Fold each micro-batch's rows for this user into running state;
    emit the updated totals (update output mode)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) with explicit state. With
    availableNow over a static directory the converged emission equals
    the batch aggregation — which is its oracle."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
