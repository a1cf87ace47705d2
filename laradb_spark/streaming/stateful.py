"""Custom stateful streaming operator via applyInPandasWithState — the
pattern for operators Spark's built-in windows can't express (per-key
running accumulators with custom emit logic). The reference has no
streaming at all (SURVEY.md §2.4); this is the beyond-reference surface.

Example operator: per-key running total with threshold alerts. State =
(cum_sum, cum_count); each micro-batch folds its rows into the state and
emits one row per key with the updated totals and an alert flag.

Scale: state is per-key and partition-local (hash-shuffled on the key);
at large key cardinality use the RocksDB state store
(spark.sql.streaming.stateStore.providerClass) — config, not code.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("cum_value", T.DoubleType()),
    T.StructField("cum_events", T.LongType()),
    T.StructField("alert", T.BooleanType()),
])
STATE_SCHEMA = T.StructType([
    T.StructField("cum_value", T.DoubleType()),
    T.StructField("cum_events", T.LongType()),
])


def running_total_with_alerts(
    events: DataFrame,
    threshold: float = 10_000.0,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming: per-key running value/count with an alert once the
    cumulative value crosses ``threshold``."""

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (cum_v, cum_n) = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            cum_v += float(pdf[value_col].sum())
            cum_n += int(len(pdf))
        state.update((cum_v, cum_n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "cum_value": [round(cum_v, 2)],
                "cum_events": [cum_n],
                "alert": [cum_v > threshold],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


SESSION_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("closed", T.BooleanType()),
])
SESSION_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])


def idle_session_close(
    events: DataFrame,
    idle_gap_ms: int = 5_000,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key session accumulator that EMITS A FINAL ROW when the key
    goes idle — the timeout side of applyInPandasWithState that the
    running-total operator doesn't exercise. Each batch with data for the
    key re-arms a processing-time timeout of ``idle_gap_ms``; when a later
    batch fires with the key silent past the gap, the state times out, the
    closed session summary is emitted, and the state is removed (bounded
    state: every idle key leaves the store — the manual analogue of what
    watermarks do for built-in windows)."""

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, v = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [round(v, 2)],
                 "closed": [True]}
            )
            return
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            v += float(pdf[value_col].sum())
        state.update((n, v))
        state.setTimeoutDuration(idle_gap_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(v, 2)],
             "closed": [False]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA, "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
