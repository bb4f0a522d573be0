"""Golden composite suite (SURVEY.md §5.3 item 4): TPC-H-derived query
shapes composing the §2 operators end-to-end — the 'can a user actually
run their reporting workload' check on top of per-operator parity.
(Q1→d1, Q3→c12, Q5→c10 already exist; this module adds Q6/Q12/Q14
shapes.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import dsum, o_dsum
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

# ---------------------------------------------------------------------------
# x1_tpch_q6 — forecast revenue change (pure filter + global agg)
# ---------------------------------------------------------------------------

_X1_ORACLE = f"""
SELECT {o_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24.0
"""


@register("x1_tpch_q6", oracle=_X1_ORACLE)
def x1_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive filter + one global
    sum — the query whose entire cost should be scan-side (all three
    predicates push to parquet row-group stats; no shuffle at all
    beyond the single-row final merge)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24.0)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# x2_tpch_q12 — shipping priority counts (join + conditional agg)
# ---------------------------------------------------------------------------

_X2_ORACLE = """
SELECT l_linestatus,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@register("x2_tpch_q12", oracle=_X2_ORACLE)
def x2_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + priority-bucketed conditional
    counts (the countIf pattern riding on a join)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# x3_tpch_q14 — promo revenue share (join + ratio of conditional sums)
# ---------------------------------------------------------------------------

_X3_ORACLE = f"""
SELECT 100.0 * ({o_dsum(
    "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) END"
)}) / ({o_dsum('l_extendedprice * (1 - l_discount)')}) AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01'
  AND l_shipdate < TIMESTAMP '1997-07-01'
"""


@register("x3_tpch_q14", oracle=_X3_ORACLE)
def x3_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — ratio of a conditional
    fixed-point sum to the total (one broadcast join, one aggregate;
    the division sequence is stated identically on both engines)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (100.0 * dsum(promo) / dsum(disc_price)).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
