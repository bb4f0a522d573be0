"""Incremental-view maintenance: merge(base_state, delta_state) must be
indistinguishable from full recompute for ANY cutoff — the oracle pins
one cutoff; these tests sweep others and the combinator algebra."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.operators.matview import _partials
from mysql_to_clickhouse_spark.tables import load
from tests.conftest import TEST_SF_DIR


@pytest.mark.parametrize("cutoff", ["1995-06-01", "1996-01-01", "1998-12-31"])
def test_merge_equals_recompute_any_cutoff(spark, cutoff):
    orders = load(spark, TEST_SF_DIR, "orders")
    c = F.lit(cutoff).cast("timestamp")
    merged = (
        _partials(orders.filter(F.col("o_orderdate") < c))
        .unionByName(_partials(orders.filter(F.col("o_orderdate") >= c)))
        .groupBy("o_orderpriority")
        .agg(F.sum("p_count").alias("n"), F.sum("p_sum_fp").alias("s"))
    )
    flat = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.col("o_totalprice") * 10000.0).cast("long")
        ).alias("s"),
    )
    m = {r["o_orderpriority"]: (r["n"], r["s"]) for r in merged.collect()}
    f = {r["o_orderpriority"]: (r["n"], r["s"]) for r in flat.collect()}
    assert m == f


def test_three_way_merge_associative(spark):
    """States merge associatively: (A + B) + C == A + (B + C) == flat,
    so refresh order never matters (the property CH part-merges rely
    on)."""
    orders = load(spark, TEST_SF_DIR, "orders")
    thirds = [
        orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    states = [_partials(t) for t in thirds]
    left_assoc = (
        states[0]
        .unionByName(states[1])
        .groupBy("o_orderpriority")
        .agg(F.sum("p_count").alias("p_count"), F.sum("p_sum_fp").alias("p_sum_fp"))
        .unionByName(states[2])
        .groupBy("o_orderpriority")
        .agg(F.sum("p_count").alias("n"), F.sum("p_sum_fp").alias("s"))
    )
    flat = _partials(orders).select(
        "o_orderpriority",
        F.col("p_count").alias("n"),
        F.col("p_sum_fp").alias("s"),
    )
    la = {r["o_orderpriority"]: (r["n"], r["s"]) for r in left_assoc.collect()}
    fl = {r["o_orderpriority"]: (r["n"], r["s"]) for r in flat.collect()}
    assert la == fl
