"""broadcast_when_small — the size-gated broadcast probe
(plans/dispatch.py): gate semantics, probe decision in both
directions, and the resulting physical join strategy."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.plans.dispatch import (
    broadcast_when_small,
    fact_bytes_estimate,
)
from mysql_to_clickhouse_spark.registry import all_queries
from mysql_to_clickhouse_spark.tables import load

from tests.conftest import TEST_SF_DIR

_GATE = "spark.mysql2ch.join.probeFactBytes"
_ROWS = "spark.mysql2ch.join.broadcastRows"


def _with_conf(spark, confs):
    saved = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_gate_skips_probe_on_small_fact(spark):
    """Below the fact-bytes gate the input object comes back untouched
    (no probe job, no broadcast hint) — the sf0.01/sf0.1 drive path."""
    li = load(spark, TEST_SF_DIR, "lineitem")
    build = load(spark, TEST_SF_DIR, "orders").select("o_orderkey")
    assert fact_bytes_estimate(li) < 1 << 30  # testdata really is small
    out = broadcast_when_small(build, li, spark)
    assert out is build


def test_probe_broadcasts_small_build(spark):
    """Gate forced open + roomy row limit -> the fact join plans as a
    BroadcastHashJoin with the reduced side as the build relation, so
    the fact side never shuffle-writes."""
    saved = _with_conf(spark, {_GATE: "0", _ROWS: "10000000"})
    try:
        li = load(spark, TEST_SF_DIR, "lineitem")
        build = (
            load(spark, TEST_SF_DIR, "orders")
            .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            .select("o_orderkey")
        )
        out = broadcast_when_small(build, li, spark)
        assert out is not build
        joined = li.join(out, li.l_orderkey == out.o_orderkey).groupBy().count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        _restore(spark, saved)


def test_probe_declines_big_build(spark):
    """Gate forced open but the reduced side exceeds the row limit (the
    100 TB shape: a 'reduced' dim that is still huge) -> unchanged
    object, honest shuffle plan stands."""
    saved = _with_conf(spark, {_GATE: "0", _ROWS: "0"})
    try:
        li = load(spark, TEST_SF_DIR, "lineitem")
        build = load(spark, TEST_SF_DIR, "orders").select("o_orderkey")
        out = broadcast_when_small(build, li, spark)
        assert out is build
    finally:
        _restore(spark, saved)


def test_c12_c10_hash_stable_under_forced_probe(spark, duck):
    """The probe is a pure strategy choice: forcing it on (gate=0) must
    leave c12/c10 oracle-equal under the strict driver-hash model."""
    from mysql_to_clickhouse_spark.verify import run_and_compare

    qs = all_queries()
    saved = _with_conf(spark, {_GATE: "0"})
    try:
        for qid in ("c12_q3_shipping", "c10_star_multiway"):
            res = run_and_compare(spark, duck, qs[qid], TEST_SF_DIR)
            assert res.ok, f"{qid}: {res.detail}"
    finally:
        _restore(spark, saved)
