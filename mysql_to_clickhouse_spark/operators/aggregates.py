"""§2.D — aggregations (the ClickHouse aggregate surface on Spark).

ClickHouse-analog functions (uniq, argMax, countIf, quantile, topK,
groupArray) are expressed with built-in JVM-side Spark aggregates —
no UDFs, fully map-side-combinable, so every query here is a single
shuffle on its grouping key at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import dmean, dsum, o_dmean, o_dsum
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

# ---------------------------------------------------------------------------
# d1_group_basic — TPC-H Q1 pricing summary (the flagship query)
# ---------------------------------------------------------------------------

_D1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {o_dsum('l_quantity')} AS sum_qty,
  {o_dsum('l_extendedprice')} AS sum_base_price,
  {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {o_dmean('l_quantity')} AS avg_qty,
  {o_dmean('l_extendedprice')} AS avg_price,
  {o_dmean('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("d1_group_basic", oracle=_D1_ORACLE, tier="T1")
def d1_group_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with 8 aggregates over 2 grouping keys (TPC-H Q1).

    Scale: filter pushes to the parquet scan; partial aggregation
    (map-side combine) reduces the shuffle to |groups| × partitions rows
    — 6 groups here, so the shuffle is trivially small at any SF.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            dmean("l_quantity").alias("avg_qty"),
            dmean("l_extendedprice").alias("avg_price"),
            dmean("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
