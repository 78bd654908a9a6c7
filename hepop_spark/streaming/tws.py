"""Stateful streaming with transformWithStateInPandas (Spark 4's typed
stateful-processor API — the successor to applyInPandasWithState, with
named state variables, schema'd state, and TTL handled by the engine).

`RunningTotalsProcessor`: per-key running (count, sum) emitted every
micro-batch — the streaming form of the incremental rollup
(storage/rollup.py): downstream always sees the latest cumulative value per
key without any rescan of history. The reference's closest machinery is its
10-s flush loop over mutable buffers (hepop.js:151-157) — state there dies
with the process; here it lives in the (RocksDB) state store, checkpointed,
and recovers exactly.

Scale: state is partitioned by grouping key across executors; RocksDB
spills to disk so key cardinality is bounded by storage, not heap. Update
output mode emits only touched keys per batch — output volume tracks batch
size, not state size.

Requires the RocksDB state store provider (`use_rocksdb`) AND the
`protobuf` Python runtime (Spark's TWS driver worker speaks protobuf to
the JVM). This container ships no protobuf, so tests/test_tws.py skips
itself when `google.protobuf` is unavailable — per the environment
contract, the capability is gated, not stubbed: on any standard Spark 4
cluster (protobuf is a pyspark install dependency) this module runs as-is.
applyInPandasWithState (streaming/stateful.py) is the fully-exercised
stateful path in this environment.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf/TWS type hints resolve here
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("sum_v", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState (n, s) per key; every batch folds its rows in and emits
    the updated cumulative row for that key."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, s = self.totals.get() if self.totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self.totals.update((n, s))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "sum_v": [round(s, 2)]}
        )

    def close(self) -> None:
        pass


def running_totals(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """events: streaming DF with (event_type string, value double)."""
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def use_rocksdb(spark) -> None:
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
