"""Unit tests for the two-phase parallel prefix scan (plans/prefix.py):
value parity against the single-partition window it replaces, boundary
carry correctness for global_lag, and degenerate inputs."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.plans.prefix import (
    global_lag,
    global_row_number,
    running_sums,
)


def _seq_df(spark, n=1000, parts=16):
    # keys deliberately non-contiguous and shuffled across partitions
    return (
        spark.range(n, numPartitions=parts)
        .select(
            (F.col("id") * 7919 % 104729).alias("k"),
            (F.col("id") % 13 + 1).alias("v"),
        )
    )


def test_running_sums_matches_global_window(spark):
    df = _seq_df(spark)
    got, totals = running_sums(df, ["k"], {"cum": F.col("v")}, n_range=8)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select("k", F.sum("v").over(w).cast("long").alias("cum"))
    assert (
        got.select("k", "cum").exceptAll(want).count() == 0
        and want.exceptAll(got.select("k", "cum")).count() == 0
    )
    assert totals["cum"] == df.agg(F.sum("v")).collect()[0][0]


def test_running_sums_two_columns_share_one_scan(spark):
    df = _seq_df(spark, n=500)
    got, totals = running_sums(
        df, ["k"], {"ca": F.col("v"), "cb": F.lit(1)}, n_range=4
    )
    last = got.orderBy(F.desc("k")).limit(1).collect()[0]
    assert last["ca"] == totals["ca"]
    assert last["cb"] == totals["cb"] == 500


def test_running_sums_negative_deltas(spark):
    # sweep-line shape: deltas of +1/-1 must produce exact depths
    df = _seq_df(spark, n=400).select(
        "k", F.when(F.col("v") % 2 == 0, 1).otherwise(-1).alias("d")
    )
    got, _ = running_sums(df, ["k"], {"depth": F.col("d")}, n_range=8)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select("k", F.sum("d").over(w).cast("long").alias("depth"))
    assert got.select("k", "depth").exceptAll(want).count() == 0


def test_global_row_number_dense_and_total(spark):
    df = _seq_df(spark, n=777)
    got, n = global_row_number(df, ["k"], out_col="rn", n_range=8)
    assert n == 777
    rns = [r["rn"] for r in got.select("rn").collect()]
    assert sorted(rns) == list(range(1, 778))
    # rn order must agree with k order
    rows = got.select("k", "rn").orderBy("k").collect()
    assert [r["rn"] for r in rows] == list(range(1, 778))


def test_global_row_number_mixed_directions(spark):
    df = _seq_df(spark, n=300)
    got, _ = global_row_number(
        df, [F.col("v").desc(), F.col("k").asc()], out_col="rn", n_range=8
    )
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc())
    want = df.select(
        "k", "v", F.row_number().over(w).cast("long").alias("rn")
    )
    assert got.select("k", "v", "rn").exceptAll(want).count() == 0


def test_global_lag_matches_window_lag(spark):
    df = _seq_df(spark, n=600)
    got = global_lag(df, ["k"], "v", out_col="prev_v", n_range=8)
    want = df.select(
        "k", "v", F.lag("v").over(Window.orderBy("k")).alias("prev_v")
    )
    assert got.select("k", "v", "prev_v").exceptAll(want).count() == 0
    # exactly one NULL: the global first row
    assert got.filter(F.col("prev_v").isNull()).count() == 1


def test_helpers_on_empty_input(spark):
    df = _seq_df(spark).filter(F.lit(False))
    got, totals = running_sums(df, ["k"], {"cum": F.col("v")})
    assert got.count() == 0 and totals["cum"] == 0
    lagged = global_lag(df, ["k"], "v", out_col="p")
    assert lagged.count() == 0


def test_no_global_window_in_helper_plans(spark):
    from mysql_to_clickhouse_spark.plans.explain import global_window_nodes

    df = _seq_df(spark)
    got, _ = running_sums(df, ["k"], {"cum": F.col("v")})
    assert not global_window_nodes(got)
    lagged = global_lag(df, ["k"], "v", out_col="p")
    assert not global_window_nodes(lagged)
