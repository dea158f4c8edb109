"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.11: the extension mechanism for operators Structured
Streaming lacks; this is the engine's pattern for "keep per-key state
across micro-batches").

The operator here is a running per-user engagement accumulator: state
= (n_events, total_value) per user_id, updated every micro-batch,
emitting the refreshed totals for users seen in that batch — the
stateful generalization of the Redis ZINCRBY leaderboard (reference
src/process.py:92), kept inside the engine instead of an external
store.

Scale notes: state is partitioned by the grouping key across
executors (RocksDB-backed state store in production via
``spark.sql.streaming.stateStore.providerClass``); the pandas
function sees one Arrow batch per key group, never row-at-a-time
Python. GroupStateTimeout would evict idle keys for unbounded key
spaces — the fixture replay is bounded, so no timeout here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        vals = pdf["value"].dropna()
        n += len(pdf)
        total += float(vals.sum()) if len(vals) else 0.0
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum) across micro-batches."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
