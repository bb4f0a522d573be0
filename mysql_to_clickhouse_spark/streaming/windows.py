"""Streaming event-time windows with watermarks — the true-streaming
twins of h1 (tumbling) and h5 (dedup), plus session windows (h3 twin).

Each runs as a real Structured Streaming query over the replayed events
table; tests assert the streamed result equals the batch operator
(streaming/batch equivalence, SURVEY.md §5.3).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.streaming.replay import (
    run_stream_to_memory,
    write_replay_slices,
)


def _stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay_dir, ev = write_replay_slices(spark, sf_dir)
    return (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(replay_dir)
    )


def tumbling_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h1 twin: 10-minute tumbling counts per event type, complete mode
    (complete == batch answer once the stream drains)."""
    name = f"tumbling_{uuid.uuid4().hex[:8]}"
    agg = (
        _stream(spark, sf_dir)
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("win.start").alias("win_start_us"), "event_type", "n"
        )
    )
    run_stream_to_memory(agg, name, output_mode="complete")
    return spark.table(name)


def tumbling_counts_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h4 twin: same aggregate under a 1-hour watermark in APPEND mode —
    only windows the watermark has sealed are emitted (the late-data
    drop semantics, observable as a subset of the batch answer)."""
    name = f"tumbling_wm_{uuid.uuid4().hex[:8]}"
    agg = (
        _stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("win.start").alias("win_start_us"), "event_type", "n"
        )
    )
    run_stream_to_memory(agg, name, output_mode="append")
    return spark.table(name)


def session_windows_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h3 twin: native session_window(ts, '30 minutes') per user."""
    name = f"session_{uuid.uuid4().hex[:8]}"
    agg = (
        _stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("win.start").alias("session_start_us"),
            F.unix_micros("win.end").alias("session_end_us"),
            "n_events",
        )
    )
    run_stream_to_memory(agg, name, output_mode="append")
    return spark.table(name)


def dedup_within_watermark_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h5 twin: dropDuplicatesWithinWatermark on (user_id, event_type)."""
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    deduped = (
        _stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    run_stream_to_memory(deduped, name, output_mode="append")
    return spark.table(name)
