"""Projection selection (plans/projection.py): choice rules and
rollup-vs-raw exactness on the real fixtures."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import fixed_point
from mysql_to_clickhouse_spark.plans.projection import Projection, pick, rollup
from mysql_to_clickhouse_spark.tables import load
from tests.conftest import TEST_SF_DIR


def _proj(spark, name, keys):
    ev = load(spark, TEST_SF_DIR, "events")
    cols = {
        "event_type": F.col("event_type"),
        "day": F.expr("unix_micros(ts) div 86400000000"),
        "user_id": F.col("user_id"),
    }
    state = ev.groupBy(*[cols[k].alias(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("p_count"),
        F.sum(fixed_point("value")).alias("p_sum_fp"),
    )
    return Projection(name=name, keys=tuple(keys), state=state)


def test_pick_prefers_fewest_surplus_keys(spark):
    fine = _proj(spark, "by_type_day_user", ["event_type", "day", "user_id"])
    mid = _proj(spark, "by_type_day", ["event_type", "day"])
    assert pick({"event_type"}, [fine, mid]) is mid
    assert pick({"event_type", "user_id"}, [fine, mid]) is fine
    # nothing can answer a key no projection carries
    assert pick({"value"}, [fine, mid]) is None


def test_pick_deterministic_tie(spark):
    a = _proj(spark, "a_proj", ["event_type", "day"])
    b = _proj(spark, "b_proj", ["event_type", "user_id"])
    assert pick({"event_type"}, [b, a]).name == "a_proj"


def test_rollup_equals_raw_aggregate(spark):
    mid = _proj(spark, "by_type_day", ["event_type", "day"])
    got = (
        rollup(mid, ["event_type"])
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = load(spark, TEST_SF_DIR, "events")
    want = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(fixed_point("value")).cast("double") / F.lit(10000.0)
            ).alias("total_value"),
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert (got["n"] == want["n"]).all()
    assert (got["total_value"] == want["total_value"]).all()  # bit-equal


def test_rollup_rejects_unanswerable(spark):
    mid = _proj(spark, "by_type_day", ["event_type", "day"])
    with pytest.raises(ValueError, match="user_id"):
        rollup(mid, ["event_type", "user_id"])
