"""checkpoint_boundary / release_shuffles — the stage-boundary shuffle
hygiene API (the engine form of the r6 session-restart workaround)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.plans.boundary import (
    checkpoint_boundary,
    release_shuffles,
    shuffle_footprint,
)


def _shuffled_frame(spark, n=200_000, tag=0):
    # two chained shuffles (repartition + groupBy) so the boundary has
    # real multi-stage state to reclaim
    return (
        spark.range(0, n)
        .withColumn("k", (F.col("id") + tag) % 997)
        .repartition(8, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
    )


def test_release_shuffles_frees_disk(spark):
    df = _shuffled_frame(spark, tag=1)
    assert df.count() == 997
    n_before, bytes_before = shuffle_footprint(spark)
    assert n_before > 0 and bytes_before > 0
    released = release_shuffles(spark)
    assert released, "no shuffle ids found to release"
    n_after, _ = shuffle_footprint(spark)
    assert n_after == 0, f"{n_after} shuffle files survived the release"


def test_checkpoint_boundary_cuts_lineage_and_releases(spark):
    df = _shuffled_frame(spark, tag=2)
    want = df.toPandas().sort_values("k").reset_index(drop=True)
    out = checkpoint_boundary(df)
    # released: nothing upstream left on disk
    n_after, _ = shuffle_footprint(spark)
    assert n_after == 0
    # lineage cut: the result is a bare file scan, no exchange upstream
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "parquet" in plan.lower(), plan
    # value-identical to the pre-boundary answer
    got = out.toPandas().sort_values("k").reset_index(drop=True)[want.columns]
    assert got.equals(want)


def test_release_is_safe_by_recompute_for_live_frames(spark):
    """The documented failure mode of releasing a shuffle another live
    DataFrame still needs is a stage RECOMPUTE, never a wrong answer."""
    live = _shuffled_frame(spark, tag=3)
    assert live.count() == 997  # materialize its shuffles
    release_shuffles(spark)  # yank them
    # the live frame must still answer, by re-running its map stages
    again = live.agg(F.sum("n").alias("t"), F.sum("s").alias("ss")).first()
    assert again["t"] == 200_000
    assert again["ss"] == 200_000 * 199_999 // 2
