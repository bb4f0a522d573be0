"""Scale-pattern operators: the techniques a 100 TB deployment leans on,
each proven correct against the plain-formulation oracle.

- c13_salted_agg: two-phase salted aggregation for skewed keys — the
  oracle is the UNsalted aggregate, proving salting changes nothing but
  the shuffle layout.
- a8_scd2_history: slowly-changing-dimension (type 2) intervals from the
  CDC event stream — the warehouse-side shape of the replication
  pipeline's history table.
- a9_bucketed_join: bucketed tables joining WITHOUT a shuffle (the
  co-located join the category achieves by sharding MySQL reads and
  ClickHouse writes the same way); tests assert the Exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import (
    dsum,
    fixed_point,
    o_dsum,
)
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

# ---------------------------------------------------------------------------
# c13_salted_agg — skew-safe two-phase aggregation
# ---------------------------------------------------------------------------

_C13_ORACLE = f"""
SELECT event_type, COUNT(*) AS n, {o_dsum('value')} AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("c13_salted_agg", oracle=_C13_ORACLE)
def c13_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation: phase 1 groups by (key, salt) — spreading a
    hot key over 8 reducers — phase 2 combines the partials by key.

    events has only 5 event_type values, the canonical skew shape: an
    unsalted shuffle sends ~20% of ALL rows to each of 5 reducers no
    matter how many executors exist. The oracle (plain aggregate)
    proves the two-phase result is identical; fixed-point partials make
    the combine exact."""
    ev = load(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(8)))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(fixed_point("value")).alias("pv"),
        )
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            (F.sum("pv").cast("double") / 10000.0).alias("total_value"),
        )
        .select("event_type", "n", "total_value")
    )


# ---------------------------------------------------------------------------
# a8_scd2_history — type-2 slowly-changing-dimension intervals
# ---------------------------------------------------------------------------

_A8_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, event_type, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
         LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id
           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
         ) AS next_us
  FROM events
)
SELECT user_id, event_id, event_type, value, valid_from_us,
       COALESCE(next_us - 1, -1) AS valid_to_us,
       next_us IS NULL AS is_current
FROM seq
ORDER BY user_id, valid_from_us, event_id
"""


@register("a8_scd2_history", oracle=_A8_ORACLE)
def a8_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2: every CDC event becomes a versioned row with a
    [valid_from, valid_to] interval (half-open, sentinel -1 = current).
    This is the history table a replication pipeline keeps next to the
    latest-wins table (a4) — one window pass, one shuffle by PK."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("valid_from_us"),
    ).withColumn("next_us", F.lead("valid_from_us").over(w))
    return seq.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "valid_from_us",
        F.coalesce(F.col("next_us") - 1, F.lit(-1)).alias("valid_to_us"),
        F.col("next_us").isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# a9_bucketed_join — co-located (shuffle-free) join via bucketing
# ---------------------------------------------------------------------------

_A9_ORACLE = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders, {o_dsum('o_totalprice')} AS segment_spend
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("a9_bucketed_join", oracle=_A9_ORACLE, tier="T3")
def a9_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two tables bucketed on the join key: both sides are written
    with bucketBy(8, custkey) + sortBy, so the sort-merge join reads
    co-located buckets and needs NO Exchange on either side (asserted
    in tests/test_plans.py). The 'merge' hint keeps the broadcast
    planner from hiding the bucketed path at this toy scale.

    This is the shuffle-you-pay-once pattern: at 100 TB, bucketing the
    fact tables by their join key at ingest time (the a5 sink) turns
    every subsequent fact-fact join into a local merge."""
    import shutil
    import tempfile

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    # explicit LOCATION: the host session's default warehouse is
    # cwd-relative and the caller's cwd may not be writable
    wh = f"{tempfile.gettempdir()}/m2c_bkt_warehouse"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS m2c_bkt LOCATION '{wh}'")
    for tbl in ("orders_b", "customer_b"):
        # a stale location from a previous session blocks saveAsTable
        # even in overwrite mode (LOCATION_ALREADY_EXISTS)
        spark.sql(f"DROP TABLE IF EXISTS m2c_bkt.{tbl}")
        shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
    (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("m2c_bkt.orders_b")
    )
    (
        cust.select("c_custkey", "c_mktsegment")
        .write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("m2c_bkt.customer_b")
    )
    ob = spark.table("m2c_bkt.orders_b")
    cb = spark.table("m2c_bkt.customer_b")
    return (
        ob.hint("merge")
        .join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("segment_spend"),
        )
    )
