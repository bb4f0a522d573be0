"""Property-based differential testing (SURVEY.md §5.3 item 3): random
small tables, composed relational ops, Spark vs DuckDB must agree
exactly. Integer-only values keep both engines in exact arithmetic, so
any disagreement is a real semantic bug, not float noise."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),        # key
        st.integers(min_value=-1000, max_value=1000),  # val
        st.sampled_from(["x", "y", "z"]),              # tag
    ),
    min_size=0,
    max_size=50,
)


@given(rows=rows_strategy)
@settings(max_examples=12, deadline=None)
def test_groupby_agg_differential(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "tag"])
    sdf = spark.createDataFrame(pdf) if len(pdf) else None
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql(
        "SELECT k, tag, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s, "
        "MIN(v) AS lo, MAX(v) AS hi FROM t GROUP BY k, tag"
    ).df()
    if sdf is None:
        assert len(want) == 0
        return
    from pyspark.sql import functions as F

    got = (
        sdf.groupBy("k", "tag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .toPandas()
    )
    key = ["k", "tag"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(rows=rows_strategy, lo=st.integers(-5, 5), hi=st.integers(-5, 5))
@settings(max_examples=12, deadline=None)
def test_filter_distinct_differential(spark, rows, lo, hi):
    pdf = pd.DataFrame(rows, columns=["k", "v", "tag"])
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql(
        f"SELECT DISTINCT k, tag FROM t WHERE k BETWEEN {lo} AND {hi}"
    ).df()
    if len(pdf) == 0:
        assert len(want) == 0
        return
    from pyspark.sql import functions as F

    got = (
        spark.createDataFrame(pdf)
        .filter(F.col("k").between(lo, hi))
        .select("k", "tag")
        .distinct()
        .toPandas()
    )
    key = ["k", "tag"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(
    rows_a=rows_strategy,
    rows_b=rows_strategy,
    how=st.sampled_from(["inner", "left", "full"]),
    nullify=st.integers(min_value=-5, max_value=5),
)
@settings(max_examples=12, deadline=None)
def test_join_differential(spark, rows_a, rows_b, how, nullify):
    """Join semantics under duplicate and NULL keys: Spark and DuckDB
    must agree on row multiplicity and NULL-key non-matching for
    inner/left/full joins."""
    pdf_a = pd.DataFrame(rows_a, columns=["k", "v", "tag"])
    pdf_b = pd.DataFrame(rows_b, columns=["k", "w", "tag2"]).drop(columns=["tag2"])
    # plant NULL keys on both sides (never match in a plain join)
    pdf_a["k"] = pdf_a["k"].where(pdf_a["k"] != nullify, pd.NA).astype("Int64")
    pdf_b["k"] = pdf_b["k"].where(pdf_b["k"] != nullify, pd.NA).astype("Int64")
    if len(pdf_a) == 0 or len(pdf_b) == 0:
        return
    con = duckdb.connect()
    con.register("a", pdf_a)
    con.register("b", pdf_b)
    sql_how = {"inner": "JOIN", "left": "LEFT JOIN", "full": "FULL JOIN"}[how]
    want = con.sql(
        f"SELECT a.k AS ka, a.v, a.tag, b.k AS kb, b.w "
        f"FROM a {sql_how} b ON a.k = b.k"
    ).df()
    sa = spark.createDataFrame(pdf_a)
    sb = spark.createDataFrame(pdf_b)
    got = (
        sa.join(sb, sa["k"] == sb["k"], how)
        .select(
            sa["k"].alias("ka"), "v", "tag", sb["k"].alias("kb"), "w"
        )
        .toPandas()
    )
    key = ["ka", "v", "tag", "kb", "w"]

    def canon(df):
        out = df.copy()
        for c in key:
            out[c] = out[c].astype("float64") if c != "tag" else out[c]
        return out.sort_values(key, na_position="last").reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


float_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group key
        st.floats(
            min_value=-1e9,
            max_value=1e9,
            allow_nan=False,
            allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=60,
)


@given(rows=float_rows)
@settings(max_examples=15, deadline=None)
def test_fixed_point_sum_differential(spark, rows):
    """The engine-parity cornerstone (functions/numeric.py): dsum over
    ARBITRARY doubles must be bit-identical between Spark and DuckDB —
    the property every checked float aggregate in the registry relies
    on. Random magnitudes up to 1e9 cover the scales the fixed-point
    trick must survive (TPC-H money, event values)."""
    import duckdb
    import pandas as pd

    from mysql_to_clickhouse_spark.functions.numeric import dsum, o_dsum

    pdf = pd.DataFrame(rows, columns=["k", "v"])
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql(
        f"SELECT k, {o_dsum('v')} AS s FROM t GROUP BY k ORDER BY k"
    ).df()
    from pyspark.sql import functions as F  # noqa: F401

    got = (
        spark.createDataFrame(pdf)
        .groupBy("k")
        .agg(dsum("v").alias("s"))
        .orderBy("k")
        .toPandas()
    )
    # bit-identical, not approx: stringify like the driver's hash does
    assert list(map(str, got["s"])) == list(map(str, want["s"]))
    assert list(got["k"]) == list(want["k"])


@given(rows=rows_strategy)
@settings(max_examples=10, deadline=None)
def test_window_functions_differential(spark, rows):
    """Window semantics vs DuckDB on random data: row_number/lag/
    running-sum over a deterministic total order (k, v, tag, rn is not
    total — add a synthetic unique id). Integer-only → exact."""
    pdf = pd.DataFrame(rows, columns=["k", "v", "tag"])
    if len(pdf) == 0:
        return
    pdf = pdf.reset_index().rename(columns={"index": "uid"})
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql(
        "SELECT uid, "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY v, uid) AS rn, "
        "LAG(v, 1) OVER (PARTITION BY k ORDER BY v, uid) AS prev_v, "
        "CAST(SUM(v) OVER (PARTITION BY k ORDER BY v, uid "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum "
        "FROM t ORDER BY uid"
    ).df()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("k").orderBy("v", "uid")
    got = (
        spark.createDataFrame(pdf)
        .select(
            "uid",
            F.row_number().over(w).alias("rn"),
            F.lag("v", 1).over(w).alias("prev_v"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("run_sum"),
        )
        .orderBy("uid")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_forward_asof_window_trick_equals_bruteforce(spark):
    """c17's union-marker window must equal brute-force per-view argmin
    over purchases, including the tricky cases: same-instant
    view/purchase (must NOT match — strict >), multiple purchases at
    the same later instant (earliest event_id wins), interleaved
    views."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    eid = 0
    for uid in range(6):
        for _ in range(rng.randint(3, 25)):
            t = rng.randint(0, 50)  # dense -> lots of ties
            et = rng.choice(["view", "purchase"])
            rows.append((eid, uid, t, et))
            eid += 1
    # planted adversarial cases: same-ts view+purchase; duplicate purchases
    rows += [
        (900, 77, 10, "view"), (901, 77, 10, "purchase"),
        (902, 77, 12, "purchase"), (903, 77, 12, "purchase"),
        (904, 78, 5, "view"),  # no purchase at all for user 78
    ]

    def brute():
        out = {}
        for e, u, t, et in rows:
            if et != "view":
                continue
            cands = [
                (t2, e2)
                for (e2, u2, t2, et2) in rows
                if u2 == u and et2 == "purchase" and t2 > t
            ]
            if cands:
                out[e] = min(cands)[1]
        return out

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string"
    )
    tagged = df.select(
        "user_id",
        "event_id",
        "ts_us",
        (F.col("event_type") == "view").cast("int").alias("d"),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "p_id"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "d", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    got = {
        r["event_id"]: r["nxt"]
        for r in tagged.select(
            "event_id",
            "d",
            F.first("p_id", ignorenulls=True).over(w).alias("nxt"),
        )
        .filter((F.col("d") == 1) & F.col("nxt").isNotNull())
        .collect()
    }
    assert got == brute()


def test_mann_whitney_u2_equals_pair_counting(spark):
    """d32's collapsed-count 2U formula must equal the definitional
    pair count 2*(#[a>b] + 0.5*#[a==b]) on randomized samples with
    heavy ties."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(21)
    a = [float(rng.randint(0, 8)) for _ in range(200)]
    b = [float(rng.randint(0, 8)) for _ in range(150)]
    expected_2u = sum(
        2 if x > y else (1 if x == y else 0) for x in a for y in b
    )
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "value double, grp string")
    vc = df.groupBy("value").agg(
        F.count(F.when(F.col("grp") == "a", 1)).alias("n_a"),
        F.count(F.when(F.col("grp") == "b", 1)).alias("n_b"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    c = vc.select(
        "n_a", "n_b", F.coalesce(F.sum("n_b").over(w), F.lit(0)).alias("cum_b")
    )
    got = c.agg(
        F.sum(F.col("n_a") * (2 * F.col("cum_b") + F.col("n_b"))).alias("u2")
    ).first()["u2"]
    assert got == expected_2u
