"""DECIMAL columns through a REAL parquet round trip.

The testdata ships no decimal-typed columns (r8 verdict gap #5), so
a6b builds DECIMAL(14,2) in-flight. This test closes the storage half:
the decimal column is WRITTEN to parquet (physical DECIMAL annotation),
read back by Spark (schema fidelity + predicate pushdown on the
decimal) and by DuckDB from the very same files, and both engines'
exact decimal aggregates must agree to the last cent — the
MySQL-DECIMAL-source scenario end to end, minus only the wire."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from mysql_to_clickhouse_spark.operators.scans import _cents, _cents_to_decimal
from mysql_to_clickhouse_spark.tables import load

SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def money_parquet(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("decimal") / "money.parquet")
    li = load(spark, SMOKE_SF_DIR, "lineitem")
    cents = _cents("l_extendedprice")
    (
        li.select(
            "l_orderkey",
            "l_returnflag",
            _cents_to_decimal(cents).alias("price_dec"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_decimal_schema_survives_roundtrip(spark, money_parquet):
    rd = spark.read.parquet(money_parquet)
    assert rd.schema["price_dec"].dataType == DecimalType(14, 2)


def test_decimal_filter_pushes_down(spark, money_parquet):
    rd = spark.read.parquet(money_parquet).filter(
        F.col("price_dec") > F.lit("50000.00").cast("decimal(14,2)")
    )
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(price_dec" in plan
    # and the filter is correct, not just pushed
    n_all = spark.read.parquet(money_parquet).count()
    n_hi = rd.count()
    assert 0 < n_hi < n_all


def test_decimal_aggregates_agree_with_duckdb(spark, money_parquet):
    got = (
        spark.read.parquet(money_parquet)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price_dec").cast("string").alias("total"),
            F.min("price_dec").cast("string").alias("lo"),
            F.max("price_dec").cast("string").alias("hi"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    con = duckdb.connect()  # keep a ref: a chained temp connection is
    # GC'd before fetch ("Connection has already been closed")
    want = (
        con.sql(
            f"""
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(price_dec) AS VARCHAR) AS total,
                   CAST(MIN(price_dec) AS VARCHAR) AS lo,
                   CAST(MAX(price_dec) AS VARCHAR) AS hi
            FROM '{money_parquet}/*.parquet'
            GROUP BY l_returnflag ORDER BY l_returnflag
            """
        )
        .fetchall()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_duckdb_sees_decimal_type(money_parquet):
    con = duckdb.connect()
    (dtype,) = con.sql(
        f"SELECT typeof(price_dec) FROM '{money_parquet}/*.parquet' LIMIT 1"
    ).fetchone()
    assert dtype == "DECIMAL(14,2)"
