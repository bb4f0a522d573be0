"""Continuous CDC apply — the reference category's binlog→ClickHouse
loop as a real Structured Streaming job (SURVEY.md §3.1 entry point 2).

readStream(event slices) → writeStream.foreachBatch(merge) with
versioned parquet state: each micro-batch unions into the previous
state and keeps the latest row per PK (a4 semantics), committing a new
state version directory — never overwriting the one being read
(read-then-overwrite of the same path is the classic self-clobber).
Tombstones ('error' events) are retained in state and filtered on read,
exactly ReplacingMergeTree + FINAL.

At scale the state store would be a partitioned table (or Delta/Iceberg
MERGE); the micro-batch merge below is partition-pruned by PK range the
same way.
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


def run_cdc_stream(spark: SparkSession, sf_dir: str, n_slices: int = 3) -> DataFrame:
    """Run the CDC apply loop as a real stream; returns the final state
    (latest non-tombstone row per user_id)."""
    replay_dir, ev = write_replay_slices(spark, sf_dir, n_slices)
    state_root = scratch_dir(f"cdc_state_{uuid.uuid4().hex[:8]}_")
    versions: list[str] = []

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "value",
        )
        if versions:
            prev = batch.sparkSession.read.parquet(versions[-1])
            merged = _latest_per_key(prev.unionByName(batch))
        else:
            merged = _latest_per_key(batch)
        new_version = os.path.join(state_root, f"v{len(versions)}")
        merged.write.parquet(new_version)
        versions.append(new_version)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation",
            os.path.join(state_root, "_checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:  # pragma: no cover
        q.stop()
    final = spark.read.parquet(versions[-1])
    return final.filter(F.col("event_type") != "error").select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    )
