"""Custom stateful streaming on the Spark 4 arbitrary-state v2 API
(``transformWithStateInPandas`` + ``StatefulProcessor``) — the successor
to ``applyInPandasWithState`` (see ``stateful.py`` for the v1 shape kept
for 3.x-era parity): typed per-key state handles (ValueState/ListState/
MapState), explicit processor lifecycle, and timer support, with state in
the configured state store (RocksDB-capable — see
tests/test_streaming_dedup.py's RocksDB config test).

Runtime dependency note: the v2 API runs a Python state-server driver
worker that imports ``google.protobuf`` — environments without protobuf
(this image) fail at stream start with
``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE``; the test skips there
(``pip install protobuf`` on a real deployment). The v1
``applyInPandasWithState`` path in ``stateful.py`` has no such dependency
and is fully exercised here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("running_sum", LongType()),
        StructField("n_seen", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("s", LongType()), StructField("n", LongType())]
)


def running_totals_v2(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (sum, count) across micro-batches via a
    ``StatefulProcessor`` with one ValueState — emits the post-batch
    running totals for every key seen in the batch. State is O(keys),
    integer-exact, and survives restarts through the checkpointed state
    store."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            total = 0
            n = 0
            for pdf in rows:
                total += int(pdf[value_col].sum())
                n += len(pdf)
            if self._state.exists():
                prev_s, prev_n = self._state.get()
                total += int(prev_s)
                n += int(prev_n)
            self._state.update((total, n))
            yield pd.DataFrame(
                {"key": [str(key[0])], "running_sum": [total], "n_seen": [n]}
            )

        def close(self) -> None:
            pass

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("long").alias(value_col),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RunningTotal(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
