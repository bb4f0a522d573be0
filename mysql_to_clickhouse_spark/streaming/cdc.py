"""Continuous CDC apply — the reference category's binlog→ClickHouse
loop as a real Structured Streaming job (SURVEY.md §3.1 entry point 2).

readStream(event slices) → writeStream.foreachBatch(merge) with
versioned parquet state: each micro-batch unions into the previous
committed state and keeps the latest row per PK (a4 semantics),
committing a new state version directory — never overwriting the one
being read (read-then-overwrite of the same path is the classic
self-clobber). Tombstones ('error' events) are retained in state and
filtered on read, exactly ReplacingMergeTree + FINAL.

EXACTLY-ONCE ON RESTART (the binlog-position analog, SURVEY §3.1
step 5): the streaming checkpoint WAL pins each micro-batch's offsets,
so a re-delivered batch after a crash carries the same rows and the
same batch_id. The merge below is idempotent per batch_id — state
versions are keyed v{batch_id}, the previous state is the largest
COMMITTED version strictly below the incoming batch_id (discovered
from the sink itself, never from process memory), and a re-run
overwrites its own partial output. Kill the process mid-batch and
restart with the same checkpointLocation: no duplicate, no lost row.
This is proven across a query restart in
tests/test_streaming.py::test_cdc_checkpoint_kill_and_resume.

At scale the state store would be a partitioned table (or Delta/
Iceberg MERGE) and version discovery a manifest/log read instead of a
directory listing; the micro-batch merge below is partition-pruned by
PK range the same way.
"""

from __future__ import annotations

import os
import uuid

from mysql_to_clickhouse_spark.functions.tmputil import scratch_dir

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.streaming.replay import write_replay_slices


def _latest_per_key(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _committed_versions(state_root: str) -> list[int]:
    """Batch ids of fully-committed state versions (v{id}/_SUCCESS).

    A version dir without its _SUCCESS marker is a torn write from a
    crashed batch — invisible here, and overwritten when that batch_id
    is re-delivered after restart."""
    out = []
    for name in os.listdir(state_root):
        if name.startswith("v") and name[1:].isdigit():
            if os.path.exists(os.path.join(state_root, name, "_SUCCESS")):
                out.append(int(name[1:]))
    return sorted(out)


def make_cdc_apply(state_root: str, fail_at_batch: int | None = None):
    """foreachBatch merge closure over a versioned parquet state root.

    Idempotent per batch_id: previous state = largest committed version
    < batch_id (so a re-delivered batch never reads its own partial
    output), written with overwrite to v{batch_id}. ``fail_at_batch``
    injects a crash BEFORE the write — the kill half of the
    kill-and-resume recovery test."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if fail_at_batch is not None and batch_id == fail_at_batch:
            raise RuntimeError(f"injected crash at batch {batch_id}")
        batch = batch.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "value",
        )
        prior = [v for v in _committed_versions(state_root) if v < batch_id]
        if prior:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_root, f"v{max(prior)}")
            )
            merged = _latest_per_key(prev.unionByName(batch))
        else:
            merged = _latest_per_key(batch)
        merged.write.mode("overwrite").parquet(
            os.path.join(state_root, f"v{batch_id}")
        )

    return apply_batch


def start_cdc_query(
    spark: SparkSession,
    replay_dir: str,
    schema,
    state_root: str,
    fail_at_batch: int | None = None,
):
    """Start (or restart — same checkpointLocation resumes the WAL) the
    CDC apply stream; returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    return (
        stream.writeStream.foreachBatch(make_cdc_apply(state_root, fail_at_batch))
        .option("checkpointLocation", os.path.join(state_root, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_cdc_state(spark: SparkSession, state_root: str) -> DataFrame:
    """FINAL read of the latest committed state version: latest
    non-tombstone row per PK."""
    versions = _committed_versions(state_root)
    if not versions:
        raise FileNotFoundError(f"no committed CDC state under {state_root}")
    final = spark.read.parquet(os.path.join(state_root, f"v{versions[-1]}"))
    return final.filter(F.col("event_type") != "error").select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    )


def run_cdc_stream(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 3,
    state_root: str | None = None,
) -> DataFrame:
    """Run the CDC apply loop as a real stream; returns the final state
    (latest non-tombstone row per user_id)."""
    replay_dir, ev = write_replay_slices(spark, sf_dir, n_slices)
    if state_root is None:
        state_root = scratch_dir(f"cdc_state_{uuid.uuid4().hex[:8]}_")
    q = start_cdc_query(spark, replay_dir, ev.schema, state_root)
    q.awaitTermination(180)
    if q.isActive:  # pragma: no cover
        q.stop()
    return read_cdc_state(spark, state_root)


# ---------------------------------------------------------------------------
# Binlog-ordered apply (a35c): same versioned-state discipline, but the
# version axis is the LOG position (log_file, log_pos, seq) — what a
# real binlog tail orders by — and deletes ride as tombstoned ops.
# ---------------------------------------------------------------------------

_BINLOG_COLS = [
    "log_file", "log_pos", "seq", "op",
    "user_id", "event_id", "ts_us", "event_type", "value",
]


def _latest_per_key_binlog(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.desc("log_file"), F.desc("log_pos"), F.desc("seq")
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def make_binlog_apply(state_root: str):
    """foreachBatch merge for a decoded binlog stream: latest row per
    PK in LOG order, deletes kept as tombstones in state (filtered on
    read — ReplacingMergeTree + FINAL). Same idempotent v{batch_id}
    commit protocol as make_cdc_apply."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select(*_BINLOG_COLS)
        prior = [v for v in _committed_versions(state_root) if v < batch_id]
        if prior:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_root, f"v{max(prior)}")
            )
            merged = _latest_per_key_binlog(prev.unionByName(batch))
        else:
            merged = _latest_per_key_binlog(batch)
        merged.write.mode("overwrite").parquet(
            os.path.join(state_root, f"v{batch_id}")
        )

    return apply_batch


def read_binlog_state(spark: SparkSession, state_root: str) -> DataFrame:
    """FINAL read over the binlog-apply state: latest committed
    version, tombstones dropped."""
    versions = _committed_versions(state_root)
    if not versions:
        raise FileNotFoundError(f"no committed state under {state_root}")
    final = spark.read.parquet(os.path.join(state_root, f"v{versions[-1]}"))
    return final.filter(F.col("op") != "delete").select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    )
