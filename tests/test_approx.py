"""Tolerance tests for the approximate operators the SQL oracle can't
check (SURVEY.md §5.4: never SQL-oracle approx functions)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.registry import all_queries
from mysql_to_clickhouse_spark.tables import load
from tests.conftest import TEST_SF_DIR

QUERIES = all_queries()


def test_approx_distinct_within_rsd(spark):
    approx = (
        QUERIES["d4_approx_distinct"].fn(spark, TEST_SF_DIR).toPandas()
        .set_index("event_type")["approx_users"]
    )
    exact = (
        load(spark, TEST_SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .toPandas()
        .set_index("event_type")["u"]
    )
    for etype, est in approx.items():
        rel_err = abs(est - exact[etype]) / exact[etype]
        assert rel_err < 0.10, f"{etype}: {est} vs {exact[etype]} ({rel_err:.2%})"


def test_approx_quantile_within_band(spark):
    approx = (
        QUERIES["d8b_quantile_approx"].fn(spark, TEST_SF_DIR).toPandas()
        .set_index("l_returnflag")
    )
    exact = (
        load(spark, TEST_SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", 0.5).alias("p50"))
        .toPandas()
        .set_index("l_returnflag")["p50"]
    )
    for flag, row in approx.iterrows():
        rel_err = abs(row["p50_price"] - exact[flag]) / exact[flag]
        assert rel_err < 0.05, f"{flag}: {row['p50_price']} vs {exact[flag]}"


def test_geo_mean_udaf_matches_reference(spark):
    import numpy as np

    result = (
        QUERIES["j3_pandas_udaf"].fn(spark, TEST_SF_DIR).toPandas()
        .set_index("event_type")["geo_mean"]
    )
    pdf = load(spark, TEST_SF_DIR, "events").select("event_type", "value").toPandas()
    for etype, got in result.items():
        vals = pdf[pdf["event_type"] == etype]["value"].to_numpy()
        vals = vals[vals > 0]
        # naive float geomean — the fixed-point discipline (ln rounded
        # at 9, exact integer sum) stays within ~1e-6 relative of it
        want = float(np.exp(np.log(np.sort(vals)).mean()))
        assert abs(got - want) / want < 1e-6
        # and the exact fixed-point twin reproduces it bit-for-bit
        lnv = np.round(np.log(vals), 9)
        s_fp = int(sum(int(x) for x in np.floor(lnv * 1e9)))
        exact = round(float(np.exp(float(s_fp) / 1e9 / len(vals))), 9)
        assert got == exact, (etype, got, exact)


def test_xxhash64_stable_across_runs(spark):
    from mysql_to_clickhouse_spark.operators.scalars import _xxhash64_rows

    a = _xxhash64_rows(spark, TEST_SF_DIR).toPandas()
    b = _xxhash64_rows(spark, TEST_SF_DIR).toPandas()
    assert (a["xx64"] == b["xx64"]).all()
    assert a["bucket"].between(0, 63).all()
    # the registered digest relation reduces exactly these rows
    dig = QUERIES["g10b_xxhash64"].fn(spark, TEST_SF_DIR).collect()[0]
    assert dig["n_docs"] == len(a)
    import functools

    assert dig["xx_xor"] == functools.reduce(
        lambda acc, x: acc ^ x, (int(v) for v in a["xx64"]), 0
    )
    assert dig["bucket_sum"] == int(a["bucket"].sum())
