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
