"""Per-key running totals via transformWithStateInPandas — Spark 4's
arbitrary-state API (StatefulProcessor + typed state variables), the
successor to applyInPandasWithState used by streaming/funnel.py. The CH
analog is a continuously-maintained AggregatingMergeTree target: each
micro-batch folds a user's new events into (n, fixed-point sum) state
and emits the running totals; the final emission per key must equal the
batch aggregate, which the stream==batch test asserts.

State is two bigints per key in the RocksDB state store (the provider
this API requires); the fold is associative, so replay slicing cannot
change the result — the same merge algebra the k-family proves for
batch MV maintenance, here under the streaming runtime.

FEATURE GATE: transformWithStateInPandas drives its state-server
channel over protobuf; this sandbox ships a broken google.protobuf
(`cannot import name 'descriptor'`; installs are disallowed), so
`protobuf_available()` reports the capability and the stream==batch
test skips cleanly when it is false — the same pattern as the
multimodal codec gate (multimodal.py). On a normal Spark 4.1 install
(protobuf present) the test runs end-to-end.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

from mysql_to_clickhouse_spark.streaming.replay import (
    run_stream_to_memory,
    write_replay_slices,
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("sum_fp", LongType())]
)

_OUTPUT_SCHEMA = "user_id long, n long, sum_fp long"


class RunningTotals(StatefulProcessor):
    """ValueState fold: (n, sum_fp) += (count, Σ floor(value·1e4))."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, sum_fp = (
            self._totals.get() if self._totals.exists() else (0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            sum_fp += int(pdf["value_fp"].sum())
        self._totals.update((n, sum_fp))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "sum_fp": [sum_fp]}
        )

    def close(self) -> None:
        pass


def protobuf_available() -> bool:
    """True when the protobuf runtime transformWithStateInPandas needs
    is importable (see module docstring's feature gate)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def run_running_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events as a file stream, maintain per-user running totals
    with transformWithStateInPandas, return the final per-user state."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    replay_dir, ev = write_replay_slices(spark, sf_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    src = stream.select(
        "user_id",
        F.floor(F.col("value") * F.lit(10000.0)).cast("long").alias("value_fp"),
    )
    updated = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    name = f"running_totals_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(updated, name, output_mode="update")
    snap = spark.table(name)
    # totals only grow; final state per key = max(n) row
    return (
        snap.groupBy("user_id")
        .agg(F.max("n").alias("n"), F.max("sum_fp").alias("sum_fp"))
    )


def _apws_fold(
    key: tuple, pdfs, state
):  # state: pyspark.sql.streaming.state.GroupState
    """applyInPandasWithState twin of RunningTotals.handleInputRows:
    the identical (n, sum_fp) associative fold over GroupState."""
    n, sum_fp = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        sum_fp += int(pdf["value_fp"].sum())
    state.update((n, sum_fp))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "sum_fp": [sum_fp]})


def run_running_totals_stream_apws(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-key running totals via applyInPandasWithState — the
    arbitrary-state API that works WITHOUT the protobuf state-server
    channel, so the fold's semantics are provable in this sandbox (the
    funnel.py API). Same replay source, same fold, same output schema
    as the transformWithStateInPandas form above; the shared
    stream==batch test runs THIS path unconditionally and the TWS path
    when protobuf exists — one equality contract, two state backends.

    TWS remains the documented preferred form on Spark 4.1+ (typed
    state variables, timers, RocksDB provider); this twin exists so an
    environment without protobuf still has a proven stateful
    running-totals operator."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    replay_dir, ev = write_replay_slices(spark, sf_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    src = stream.select(
        "user_id",
        F.floor(F.col("value") * F.lit(10000.0)).cast("long").alias("value_fp"),
    )
    updated = src.groupBy("user_id").applyInPandasWithState(
        _apws_fold,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"running_totals_apws_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(updated, name, output_mode="update")
    snap = spark.table(name)
    # totals only grow; final state per key = max(n) row
    return (
        snap.groupBy("user_id")
        .agg(F.max("n").alias("n"), F.max("sum_fp").alias("sum_fp"))
    )
