

def test_lttb_matches_reference_per_series(spark):
    """d30: the distributed applyInPandas result equals the pure-Python
    LTTB reference run on each user's driver-collected series, and
    keeps endpoints + ts order."""
    import numpy as np

    from mysql_to_clickhouse_spark.operators.aggregates import (
        _LTTB_N_OUT,
        lttb_reference,
    )
    from mysql_to_clickhouse_spark.registry import all_queries
    from mysql_to_clickhouse_spark.tables import load
    from tests.conftest import SMOKE_SF_DIR

    import pyspark.sql.functions as F

    got = (
        all_queries()["d30_lttb_downsample"]
        .fn(spark, SMOKE_SF_DIR)
        .toPandas()
        .sort_values(["user_id", "point_rank"])
    )
    ev = (
        load(spark, SMOKE_SF_DIR, "events")
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "value", "event_id")
        .toPandas()
    )
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        keep = lttb_reference(
            g["ts_us"].to_numpy("int64"),
            g["value"].to_numpy("float64"),
            _LTTB_N_OUT,
        )
        exp = g.iloc[keep]
        act = got[got["user_id"] == uid]
        assert len(act) == len(exp) <= _LTTB_N_OUT
        assert act["ts_us"].tolist() == exp["ts_us"].tolist(), uid
        np.testing.assert_array_equal(
            act["value"].to_numpy(), exp["value"].to_numpy()
        )
        # endpoints always kept
        assert act["ts_us"].iloc[0] == g["ts_us"].iloc[0]
        assert act["ts_us"].iloc[-1] == g["ts_us"].iloc[-1]


def test_interval_length_sum_matches_bruteforce_on_random_intervals(spark):
    """d29 property test: the sweep-line union coverage equals a
    brute-force merge of sorted intervals on randomized inputs,
    including heavy overlap, nesting, duplicates, and exact-touching
    endpoints."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    rng = random.Random(42)
    rows = []
    for uid in range(8):
        for _ in range(rng.randint(1, 40)):
            s = rng.randint(0, 1000)
            ln = rng.choice([0, 1, 5, 50, 200])
            rows.append((uid, s, s + ln))
    # duplicates + touching intervals
    rows += [(99, 10, 20), (99, 10, 20), (99, 20, 30), (99, 40, 40)]

    def brute(iv):
        iv = sorted((s, e) for _, s, e in iv if e > s)
        total, cur_s, cur_e = 0, None, None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    total += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            total += cur_e - cur_s
        return total

    expected = {
        uid: brute([r for r in rows if r[0] == uid])
        for uid in {r[0] for r in rows}
    }
    df = spark.createDataFrame(rows, "user_id long, s long, e long").filter(
        "e > s"
    )
    pts = df.select("user_id", F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        df.select("user_id", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    wo = Window.partitionBy("user_id").orderBy("t", "d")
    sweep = pts.select(
        "user_id",
        "t",
        F.sum("d")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("depth"),
        F.lead("t").over(wo).alias("nt"),
    )
    got = {
        r["user_id"]: r["covered"]
        for r in sweep.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("depth") > 0, F.col("nt") - F.col("t"))
            ).alias("covered")
        )
        .collect()
    }
    for uid, exp in expected.items():
        assert got.get(uid, 0) == exp, (uid, got.get(uid), exp)


def test_d62_totals_modes_are_distinct(spark):
    """The three CH totals_mode semantics must be provably different on
    the same input: before_having (d62) covers every source row,
    after_having_inclusive (d62b) covers survivors + GROUP BY overflow,
    after_having_exclusive (d62c) covers survivors only — so their
    totals-row counts must be strictly decreasing, and each totals n
    must equal the sum its mode claims."""
    from mysql_to_clickhouse_spark.registry import all_queries
    from tests.conftest import TEST_SF_DIR

    qs = all_queries()

    def totals_and_groups(name):
        pdf = qs[name].fn(spark, TEST_SF_DIR).toPandas()
        tot = pdf[pdf["row_kind"] == "totals"]
        grp = pdf[pdf["row_kind"] == "group"]
        assert len(tot) == 1, name
        return int(tot["n"].iloc[0]), grp

    n_before, g_before = totals_and_groups("d62_with_totals")
    n_incl, g_incl = totals_and_groups("d62b_totals_after_having_inclusive")
    n_excl, g_excl = totals_and_groups("d62c_totals_after_having_exclusive")

    # before_having counts the whole table
    from mysql_to_clickhouse_spark.tables import load

    assert n_before == load(spark, TEST_SF_DIR, "events").count()
    # exclusive totals == sum over its own surviving group rows
    assert n_excl == int(g_excl["n"].sum())
    # inclusive adds overflow rows on top of its survivors
    assert n_incl > int(g_incl["n"].sum())
    # the three modes are strictly ordered on this data
    assert n_before > n_incl > n_excl
    # d62 and d62c share the same HAVING -> same surviving groups
    assert sorted(g_before["event_type"]) == sorted(g_excl["event_type"])
