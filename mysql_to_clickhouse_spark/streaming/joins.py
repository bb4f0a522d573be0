"""Stream-stream time-interval join (h11): views joined to the
purchases that follow them within one hour, per user — both sides are
REAL Structured Streaming sources (file replay, one slice per
micro-batch), with watermarks on both sides and an event-time range
bound so the join state is evictable.

This is the streaming join shape Spark documents for production: each
side buffers rows only until the other side's watermark passes the
interval bound; an unbounded (condition-free) stream-stream join would
accumulate state forever."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.streaming.replay import (
    run_stream_to_memory,
    write_replay_slices,
)


def stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the view→purchase interval join to a memory sink; returns
    the joined rows as a batch DataFrame (µs epochs, append mode)."""
    replay_dir, ev = write_replay_slices(spark, sf_dir)

    def src() -> DataFrame:
        return (
            spark.readStream.schema(ev.schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(replay_dir)
        )

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "10 seconds")
    )
    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 seconds")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_event_id",
        "purchase_event_id",
        F.unix_micros("v_ts").alias("view_us"),
        F.unix_micros("p_ts").alias("purchase_us"),
    )
    name = f"ssjoin_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(joined, name, output_mode="append")
    return spark.table(name)


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to a STATIC
    dimension (the customer table keyed by a derived customer id) — the
    everyday production topology where facts stream and dimensions are
    batch tables. The static side re-resolves per micro-batch (picking
    up dimension updates) and broadcasts; no state, no watermark needed
    for an inner equi join."""
    from mysql_to_clickhouse_spark.tables import load

    replay_dir, ev = write_replay_slices(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        "c_name",
        "c_mktsegment",
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            # map the event's user onto the dimension's key domain
            (F.pmod(F.col("user_id"), F.lit(1500)) + 1).alias("cust_id"),
        )
    )
    enriched = stream.join(F.broadcast(cust), "cust_id").select(
        "event_id", "user_id", "ts_us", "event_type",
        "cust_id", "c_name", "c_mktsegment",
    )
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(enriched, name, output_mode="append")
    return spark.table(name)


def stream_view_purchase_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every view, with the
    purchases that followed it within one hour — or a null-marker row
    if none did. The outer side can only emit its unmatched rows once
    the OTHER side's watermark proves no future match can arrive, so a
    bounded replay needs an end-of-stream flush: a final sentinel slice
    carries one view + one purchase far past every real interval bound,
    advancing both watermarks so all pending state resolves. Sentinel
    rows are filtered from the result; unmatched purchases surface as
    purchase_event_id = -1 (kept integral — a NULL id would force both
    engines through float NaN pandas dtype on the hash path)."""
    import os

    from pyspark.sql import Row

    replay_dir, ev = write_replay_slices(spark, sf_dir)
    hi = ev.agg(F.max("ts")).first()[0]
    import datetime

    flush_ts = hi + datetime.timedelta(hours=4)
    sentinel = spark.createDataFrame(
        [
            Row(
                event_id=-1,
                ts=flush_ts,
                user_id=-1,
                event_type=et,
                value=0.0,
                props="{}",
            )
            for et in ("view", "purchase")
        ],
        schema=ev.schema,
    )
    sentinel.coalesce(1).write.parquet(os.path.join(replay_dir, "slice_flush"))

    def src() -> DataFrame:
        return (
            spark.readStream.schema(ev.schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(replay_dir)
        )

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "10 seconds")
    )
    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 seconds")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_event_id",
        F.coalesce("purchase_event_id", F.lit(-1)).alias("purchase_event_id"),
        F.unix_micros("v_ts").alias("view_us"),
        F.coalesce(F.unix_micros("p_ts"), F.lit(-1)).alias("purchase_us"),
    )
    name = f"ssljoin_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(joined, name, output_mode="append")
    return spark.table(name).filter(F.col("view_event_id") >= 0)


def stream_view_purchase_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join: unmatched rows emit from
    BOTH sides once the opposite watermark proves no match can arrive.
    Same end-of-stream flush discipline as the left join (a far-future
    sentinel slice advances both watermarks); sentinel-derived rows all
    carry user_id = -1 (the sentinel user) and are filtered out, so the
    drained append-mode result equals the batch FULL JOIN oracle.
    Null markers stay integral (-1) for hash portability."""
    import datetime
    import os

    from pyspark.sql import Row

    replay_dir, ev = write_replay_slices(spark, sf_dir)
    hi = ev.agg(F.max("ts")).first()[0]
    flush_ts = hi + datetime.timedelta(hours=4)
    sentinel = spark.createDataFrame(
        [
            Row(
                event_id=-1,
                ts=flush_ts,
                user_id=-1,
                event_type=et,
                value=0.0,
                props="{}",
            )
            for et in ("view", "purchase")
        ],
        schema=ev.schema,
    )
    sentinel.coalesce(1).write.parquet(os.path.join(replay_dir, "slice_flush"))

    def src() -> DataFrame:
        return (
            spark.readStream.schema(ev.schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(replay_dir)
        )

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "10 seconds")
    )
    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 seconds")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "full_outer",
    ).select(
        F.coalesce("v_user", "p_user").alias("user_id"),
        F.coalesce("view_event_id", F.lit(-1)).alias("view_event_id"),
        F.coalesce("purchase_event_id", F.lit(-1)).alias("purchase_event_id"),
        F.coalesce(F.unix_micros("v_ts"), F.lit(-1)).alias("view_us"),
        F.coalesce(F.unix_micros("p_ts"), F.lit(-1)).alias("purchase_us"),
    )
    name = f"ssfjoin_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(joined, name, output_mode="append")
    return spark.table(name).filter(F.col("user_id") >= 0)
