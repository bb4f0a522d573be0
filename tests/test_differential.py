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


def test_asof_tolerance_matches_pandas_merge_asof(spark, tmp_path):
    """c18 == pandas merge_asof(tolerance=1h, direction='backward') on
    a randomized event stream (the library implementation of the same
    semantics, matching on the full view/purchase interleaving)."""
    import datetime as dt
    import random

    import pandas as pd
    from pyspark.sql import Row

    rng = random.Random(99)
    rows = []
    eid = 0
    for uid in range(6):
        t = dt.datetime(2024, 1, 1)
        for _ in range(rng.randint(5, 25)):
            t = t + dt.timedelta(minutes=rng.randint(1, 200))
            et = rng.choice(["view", "purchase", "click"])
            rows.append(Row(event_id=eid, ts=t, user_id=uid, event_type=et,
                            value=float(rng.randint(1, 100)), props="{}"))
            eid += 1
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.joins import c18_asof_tolerance

    got = (
        c18_asof_tolerance(spark, sf)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    pdf = pd.DataFrame([r.asDict() for r in rows])
    pdf["ts_us"] = pdf["ts"].astype("datetime64[us]").astype("int64")
    views = pdf[pdf.event_type == "view"][["user_id", "ts_us"]].rename(
        columns={"ts_us": "view_us"}
    ).sort_values("view_us")
    purch = pdf[pdf.event_type == "purchase"].sort_values("ts_us")
    merged = pd.merge_asof(
        purch,
        views,
        left_on="ts_us",
        right_on="view_us",
        by="user_id",
        direction="backward",
        tolerance=3_600_000_000,
    ).sort_values("event_id").reset_index(drop=True)

    assert len(got) == len(merged)
    for g, (_, m) in zip(got.itertuples(index=False), merged.iterrows()):
        expected = int(m["view_us"]) if pd.notna(m["view_us"]) else -1
        assert g.matched_view_us == expected, (g.event_id, expected)


def test_exp_decay_avg_matches_numpy_reference(spark, tmp_path):
    """d41 == a direct numpy evaluation of the documented formula
    (weights exp((t-tmax)/tau) rounded at 9, fixed-point sums)."""
    import datetime as dt
    import random

    import numpy as np
    from pyspark.sql import Row

    rng = random.Random(5)
    rows = []
    eid = 0
    for uid in range(5):
        t = dt.datetime(2024, 1, 1)
        for _ in range(rng.randint(3, 15)):
            t = t + dt.timedelta(hours=rng.randint(1, 48))
            rows.append(Row(event_id=eid, ts=t, user_id=uid, event_type="view",
                            value=round(rng.uniform(0.01, 490.0), 2), props="{}"))
            eid += 1
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d41_exp_decay_avg

    got = {r.user_id: r.decayed_avg for r in d41_exp_decay_avg(spark, sf).collect()}

    import pandas as pd

    pdf = pd.DataFrame([r.asDict() for r in rows])
    pdf["t_us"] = pdf["ts"].astype("datetime64[us]").astype("int64")
    tau = 259200000000.0
    for uid, g in pdf.groupby("user_id"):
        w = np.round(np.exp((g["t_us"] - g["t_us"].max()) / tau), 9)
        num = np.floor(w * g["value"] * 1e6).astype("int64").sum() / 1e6
        den = np.floor(w * 1e9).astype("int64").sum() / 1e9
        assert got[uid] == num / den, uid


def test_geo_distance_matches_python_haversine(spark):
    """g26 distances agree with a plain-python haversine (same rounding
    discipline) on the real customer table, and known geometry holds:
    zero distance for identical points, symmetry under swap."""
    import math

    from mysql_to_clickhouse_spark.operators.scalars import g26_geo_distance
    from tests.conftest import TEST_SF_DIR

    got = g26_geo_distance(spark, TEST_SF_DIR).limit(200).collect()

    def ref(lat1, lon1, lat2, lon2):
        d2r = 0.017453292519943295
        s_dlat = round(math.sin((lat2 - lat1) * d2r / 2.0), 9)
        s_dlon = round(math.sin((lon2 - lon1) * d2r / 2.0), 9)
        c1, c2 = round(math.cos(lat1 * d2r), 9), round(math.cos(lat2 * d2r), 9)
        a = s_dlat * s_dlat + c1 * c2 * s_dlon * s_dlon
        return 2.0 * 6371.0 * round(math.asin(math.sqrt(a)), 9)

    for r in got:
        assert r.dist_km == ref(r.lat1, r.lon1, r.lat2, r.lon2), r.c_custkey
        assert ref(r.lat1, r.lon1, r.lat1, r.lon1) == 0.0
        assert ref(r.lat2, r.lon2, r.lat1, r.lon1) == r.dist_km
