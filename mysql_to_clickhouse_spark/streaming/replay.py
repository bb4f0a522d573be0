"""Table→stream replay harness (§2.H h8): feed a batch table through a
real Structured Streaming query.

Pattern: slice the table by event time into N parquet files in arrival
order, then readStream them as a file source with Trigger.AvailableNow
— every micro-batch mechanism (state store, incremental execution,
sink commit) runs for real, but the run is bounded and deterministic.
This is the standard way to regression-test streaming topologies
against their batch equivalents.
"""

from __future__ import annotations

import os
import uuid

from mysql_to_clickhouse_spark.functions.tmputil import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.tables import load


def write_replay_slices(
    spark: SparkSession, sf_dir: str, n_slices: int = 3
) -> tuple[str, DataFrame]:
    """Write events as n_slices ts-ordered parquet files; returns the
    directory and the (already ts-normalized) batch DataFrame."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    lo, hi = int(bounds[0]), int(bounds[1]) + 1
    step = (hi - lo) // n_slices + 1
    replay_dir = scratch_dir(f"replay_{uuid.uuid4().hex[:8]}_")
    for i in range(n_slices):
        ev.filter(
            (F.unix_micros("ts") >= lo + i * step)
            & (F.unix_micros("ts") < lo + (i + 1) * step)
        ).coalesce(1).write.parquet(os.path.join(replay_dir, f"slice_{i}"))
    return replay_dir, ev


def run_stream_to_memory(
    streaming_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_sec: int = 120,
) -> None:
    """Drain a streaming DataFrame into a memory sink with AvailableNow
    (processes everything then stops)."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover - safety net
        q.stop()


def replay_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h8 body: streaming per-event-type counts over the replayed table,
    returned as a batch DataFrame read from the memory sink."""
    replay_dir, ev = write_replay_slices(spark, sf_dir)
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(replay_dir)
    )
    name = f"replay_counts_{uuid.uuid4().hex[:8]}"
    counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    run_stream_to_memory(counts, name, output_mode="complete")
    return spark.table(name).orderBy("event_type")
