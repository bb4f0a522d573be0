"""Custom stateful streaming operator: the ordered view→click→purchase
funnel (CH windowFunnel; h6's true-streaming twin) via
applyInPandasWithState.

Per-user state = (t1, t2, t3) earliest qualifying timestamps. Each
micro-batch advances the state machine with that user's new events (the
replay slices are time-ordered, so per-user event order is preserved
across batches); every batch emits the user's current funnel state, and
the final state per user equals the batch operator's answer.

State is BOUNDED two ways: (a) three timestamps per key, and (b)
event-time eviction — with ``evict_horizon_us`` set, a user's state
carries a timeout at (last event + horizon); once the watermark passes
it, Spark calls the function with ``state.hasTimedOut`` and the state is
removed (a depth −1 tombstone marks the eviction in the output). This is
the template for any custom stateful operator Spark lacks: GroupState +
Arrow batches, bounded state per key, watermark-driven eviction.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mysql_to_clickhouse_spark.streaming.replay import (
    run_stream_to_memory,
    write_replay_slices,
)

_OUTPUT_SCHEMA = (
    "user_id long, view_us long, click_us long, purchase_us long, "
    "funnel_depth int"
)
_STATE_SCHEMA = "t1 long, t2 long, t3 long"


def _make_advance(evict_horizon_us: int | None):
    """Build the per-group state function; with a horizon, each update
    re-arms an event-time timeout at (user's last event + horizon)."""

    def _advance(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed the user's horizon: drop the state and
            # emit a tombstone so eviction is observable downstream
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "view_us": [-1],
                    "click_us": [-1],
                    "purchase_us": [-1],
                    "funnel_depth": [-1],
                }
            )
            return
        t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        for _, row in rows.iterrows():
            ts, etype = int(row["ts_us"]), row["event_type"]
            if etype == "view" and t1 < 0:
                t1 = ts
            elif etype == "click" and t1 >= 0 and t2 < 0 and ts > t1:
                t2 = ts
            elif etype == "purchase" and t2 >= 0 and t3 < 0 and ts > t2:
                t3 = ts
        state.update((t1, t2, t3))
        if evict_horizon_us is not None:
            last_us = int(rows["ts_us"].max())
            state.setTimeoutTimestamp((last_us + evict_horizon_us) // 1000)
        depth = 3 if t3 >= 0 else (2 if t2 >= 0 else (1 if t1 >= 0 else 0))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "view_us": [t1],
                "click_us": [t2],
                "purchase_us": [t3],
                "funnel_depth": [depth],
            }
        )

    return _advance


# the non-evicting state function (h6 twin); kept importable for tests
_advance = _make_advance(None)


def run_funnel_stream(
    spark: SparkSession,
    sf_dir: str,
    evict_horizon_us: int | None = None,
    return_snapshots: bool = False,
):
    """Run the stateful funnel over the replayed events; returns the
    final (deepest) state per user. With ``evict_horizon_us``, state is
    evicted by event-time timeout once the watermark passes a user's
    last event + horizon (production state-size bound); pass
    ``return_snapshots=True`` to also get the raw per-batch emissions
    (including depth −1 eviction tombstones)."""
    replay_dir, ev = write_replay_slices(spark, sf_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    if evict_horizon_us is not None:
        stream = stream.withWatermark("ts", "1 second")
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    else:
        timeout_conf = GroupStateTimeout.NoTimeout
    src = stream.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
    )
    updated = src.groupBy("user_id").applyInPandasWithState(
        _make_advance(evict_horizon_us),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
    name = f"funnel_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(updated, name, output_mode="update")
    # every batch emitted a snapshot; the funnel only advances, so the
    # final state per user is the row with max (depth, timestamps);
    # eviction tombstones (depth −1) are dropped from the final view
    snap = spark.table(name)
    final = (
        snap.filter(F.col("funnel_depth") >= 0)
        .groupBy("user_id")
        .agg(
            F.max("view_us").alias("view_us"),
            F.max("click_us").alias("click_us"),
            F.max("purchase_us").alias("purchase_us"),
            F.max("funnel_depth").alias("funnel_depth"),
        )
    )
    return (final, snap) if return_snapshots else final
