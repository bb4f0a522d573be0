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


def test_running_sums_keyed_matches_running_sums(spark):
    """r12: the sampled-boundary single-shuffle variant is value- and
    total-identical to the two-phase scan (and hence to the global
    window) on non-contiguous shuffled keys."""
    from mysql_to_clickhouse_spark.plans.prefix import running_sums_keyed

    df = _seq_df(spark)
    a, ta = running_sums(df, ["k"], {"cum": F.col("v")}, n_range=8)
    b, tb = running_sums_keyed(df, "k", {"cum": F.col("v")}, n_buckets=8)
    assert ta == tb
    assert {(r["k"], r["cum"]) for r in a.collect()} == {
        (r["k"], r["cum"]) for r in b.collect()
    }


def test_running_sums_keyed_degenerate_inputs(spark):
    """Empty input, single row, and fewer distinct keys than buckets
    (duplicate quantile boundaries collapse) all stay exact."""
    from mysql_to_clickhouse_spark.plans.prefix import running_sums_keyed

    empty = _seq_df(spark).filter(F.lit(False))
    out, totals = running_sums_keyed(empty, "k", {"cum": F.col("v")})
    assert out.count() == 0 and totals == {"cum": 0}

    one = spark.createDataFrame([(5, 7)], "k long, v long")
    out, totals = running_sums_keyed(one, "k", {"cum": F.col("v")})
    assert out.collect()[0]["cum"] == 7 and totals == {"cum": 7}

    few = spark.createDataFrame(
        [(1, 10)] * 0 + [(k, k) for k in (1, 2, 3)], "k long, v long"
    )
    out, totals = running_sums_keyed(few, "k", {"cum": F.col("v")},
                                     n_buckets=64)
    got = {r["k"]: r["cum"] for r in out.collect()}
    assert got == {1: 1, 2: 3, 3: 6} and totals == {"cum": 6}


def test_running_sums_keyed_skewed_keys(spark):
    """Heavily skewed key distribution (90% of rows in one narrow key
    range): sampled boundaries adapt and values stay exact vs the
    global window."""
    from mysql_to_clickhouse_spark.plans.prefix import running_sums_keyed

    df = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.col("id") % 10)
        .otherwise(F.col("id") * 1000)
        .alias("k_raw"),
        F.lit(1).alias("v"),
    )
    # unique tie-broken key (duplicates would make peer order ambiguous)
    df = df.select(
        (F.col("k_raw") * 100000 + F.monotonically_increasing_id() % 100000)
        .alias("k"),
        "v",
    ).localCheckpoint()  # pin: monotonically_increasing_id is not stable
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    want = {(r["k"], r["cum"]) for r in
            df.select("k", F.sum("v").over(w).alias("cum")).collect()}
    got_df, totals = running_sums_keyed(df, "k", {"cum": F.col("v")},
                                        n_buckets=16)
    got = {(r["k"], r["cum"]) for r in got_df.collect()}
    assert got == want and totals == {"cum": 2000}


def test_running_sums_keyed_no_global_window_or_pin(spark):
    """The keyed variant's plan has no single-partition window AND no
    localCheckpoint pin (its reason to exist over running_sums)."""
    from mysql_to_clickhouse_spark.plans.prefix import running_sums_keyed

    df = _seq_df(spark)
    out, _ = running_sums_keyed(df, "k", {"cum": F.col("v")}, n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window node must be partitioned (no global Sort+Window)
    import re

    for m in re.finditer(r"Window \[.*?\], \[(.*?)\]", plan):
        assert m.group(1).strip(), f"unpartitioned window in plan:\n{plan}"
    assert "LogicalRDD" not in plan or "Scan ExistingRDD" not in plan
