"""§2.B — projection, filtering, predicates.

Every predicate here is a Catalyst-native expression, so it reaches the
parquet scan as a pushed filter (row-group stats + page skipping) and
the projection prunes columns at the reader — verified in
tests/test_plans.py via .explain() inspection, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

# ---------------------------------------------------------------------------
# b1_project_compute
# ---------------------------------------------------------------------------

_B1_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) AS disc_price,
  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
  l_extendedprice / l_quantity AS unit_price,
  l_quantity * 2.0 + 1.0 AS qty_affine
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@register("b1_project_compute", oracle=_B1_ORACLE, tier="T1")
def b1_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column arithmetic, row-level. Per-row IEEE expressions on
    identical operands are bit-identical across engines — no fixed-point
    needed until values are aggregated."""
    li = load(spark, sf_dir, "lineitem")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (price * (1 - disc)).alias("disc_price"),
        (price * (1 - disc) * (1 + tax)).alias("charge"),
        (price / F.col("l_quantity")).alias("unit_price"),
        (F.col("l_quantity") * 2.0 + 1.0).alias("qty_affine"),
    )


# ---------------------------------------------------------------------------
# b2_filter_compare
# ---------------------------------------------------------------------------

_B2_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
WHERE l_quantity >= 45.0
  AND l_extendedprice > 90000.0
  AND l_returnflag != 'A'
  AND l_shipdate < TIMESTAMP '2000-01-01'
ORDER BY l_orderkey, l_linenumber
"""


@register("b2_filter_compare", oracle=_B2_ORACLE, tier="T1")
def b2_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All comparison classes (num >=/>,string !=, timestamp <) — each
    pushes to the parquet scan as a native filter."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 45.0)
            & (F.col("l_extendedprice") > 90000.0)
            & (F.col("l_returnflag") != "A")
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_returnflag",
        )
        
    )


# ---------------------------------------------------------------------------
# b3_filter_boolean
# ---------------------------------------------------------------------------

_B3_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderstatus = 'P' AND o_totalprice > 200000.0)
   OR (o_orderpriority = '1-URGENT' AND NOT (o_orderstatus = 'F'))
ORDER BY o_orderkey
"""


@register("b3_filter_boolean", oracle=_B3_ORACLE, tier="T1")
def b3_filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT with grouping parentheses — boolean algebra fidelity."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(
            ((F.col("o_orderstatus") == "P") & (F.col("o_totalprice") > 200000.0))
            | (
                (F.col("o_orderpriority") == "1-URGENT")
                & ~(F.col("o_orderstatus") == "F")
            )
        )
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        
    )


# ---------------------------------------------------------------------------
# b4_filter_in_between
# ---------------------------------------------------------------------------

_B4_ORACLE = """
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'BUILDING')
  AND c_acctbal BETWEEN 1000.0 AND 5000.0
ORDER BY c_custkey
"""


@register("b4_filter_in_between", oracle=_B4_ORACLE)
def b4_filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership + inclusive BETWEEN range."""
    cust = load(spark, sf_dir, "customer")
    return (
        cust.filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY", "BUILDING")
            & F.col("c_acctbal").between(1000.0, 5000.0)
        )
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        
    )


# ---------------------------------------------------------------------------
# b5_filter_like
# ---------------------------------------------------------------------------

_B5_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_name LIKE '%gear%'
   OR p_name LIKE 'red %'
   OR (p_type LIKE '%ECO%' AND p_brand LIKE 'Brand#1_')
ORDER BY p_partkey
"""


@register("b5_filter_like", oracle=_B5_ORACLE)
def b5_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE patterns: infix %, prefix, and _ single-char wildcard."""
    part = load(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_name").like("%gear%")
            | F.col("p_name").like("red %")
            | (F.col("p_type").like("%ECO%") & F.col("p_brand").like("Brand#1_"))
        )
        .select("p_partkey", "p_name", "p_brand", "p_type")
        
    )


# ---------------------------------------------------------------------------
# b6_filter_null
# ---------------------------------------------------------------------------

_B6_ORACLE = """
WITH withnulls AS (
  SELECT
    NULLIF(l_returnflag, 'N') AS flag_n,
    NULLIF(l_linestatus, 'O') AS status_n
  FROM lineitem
)
SELECT
  COUNT(*) AS total,
  COUNT(CASE WHEN flag_n IS NULL THEN 1 END) AS flag_nulls,
  COUNT(CASE WHEN status_n IS NOT NULL THEN 1 END) AS status_not_nulls,
  COUNT(CASE WHEN flag_n IS NOT DISTINCT FROM status_n THEN 1 END) AS nullsafe_eq
FROM withnulls
"""


@register("b6_filter_null", oracle=_B6_ORACLE)
def b6_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality (<=>), on nulls
    manufactured with nullif (the testdata itself is null-free)."""
    li = load(spark, sf_dir, "lineitem")
    withnulls = li.select(
        F.nullif("l_returnflag", F.lit("N")).alias("flag_n"),
        F.nullif("l_linestatus", F.lit("O")).alias("status_n"),
    )
    return withnulls.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("flag_n").isNull(), 1)).alias("flag_nulls"),
        F.count(F.when(F.col("status_n").isNotNull(), 1)).alias("status_not_nulls"),
        F.count(
            F.when(F.col("flag_n").eqNullSafe(F.col("status_n")), 1)
        ).alias("nullsafe_eq"),
    )


# ---------------------------------------------------------------------------
# b7_case_when
# ---------------------------------------------------------------------------

_B7_ORACLE = """
SELECT
  CASE
    WHEN o_totalprice < 50000.0 THEN 'small'
    WHEN o_totalprice < 150000.0 THEN 'medium'
    WHEN o_totalprice < 300000.0 THEN 'large'
    ELSE 'jumbo'
  END AS price_band,
  COUNT(*) AS n_orders
FROM orders
GROUP BY price_band
ORDER BY price_band
"""


@register("b7_case_when", oracle=_B7_ORACLE, tier="T1")
def b7_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CASE WHEN (CH multiIf): price banding + count."""
    orders = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000.0, "small")
        .when(F.col("o_totalprice") < 150000.0, "medium")
        .when(F.col("o_totalprice") < 300000.0, "large")
        .otherwise("jumbo")
    )
    return (
        orders.groupBy(band.alias("price_band"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        
    )


# ---------------------------------------------------------------------------
# b8_sample_by — the ClickHouse SAMPLE clause (deterministic hash sampling)
# ---------------------------------------------------------------------------

_B8_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_sampled,
       COUNT(*) * 16 AS n_estimated,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_sampled
FROM events
WHERE substring(md5(CAST(user_id AS VARCHAR)), 1, 1) = '0'
GROUP BY event_type
ORDER BY event_type
"""


@register("b8_sample_by", oracle=_B8_ORACLE)
def b8_sample_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH ``SELECT ... SAMPLE 1/16`` clause: a deterministic subset
    chosen by hashing the table's sampling key (here user_id), NOT by
    rand() — so the same rows are sampled on every run, every engine,
    and every partitioning, and repeated queries over the sample are
    consistent with each other (the property CH builds SAMPLE on).
    ``n_estimated`` is the CH ``count() * any(_sample_factor)`` idiom:
    scale sampled counts back to full-table estimates.

    Scale: the predicate is map-side (one md5 per row, no shuffle
    before the aggregate) and subsets by USER, not by row — all events
    of a sampled user survive, so per-user sequences stay intact, which
    is what makes hash-sampling usable for funnels/retention where
    row-level sampling would shred sessions."""
    ev = load(spark, sf_dir, "events")
    bucket = F.substring(
        F.md5(F.encode(F.col("user_id").cast("string"), "UTF-8")), 1, 1
    )
    return (
        ev.filter(bucket == F.lit("0"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            (F.count(F.lit(1)) * 16).alias("n_estimated"),
            F.countDistinct("user_id").alias("users_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# b9_tuple_in — composite-key IN list ((a,b) IN ((..),(..)))
# ---------------------------------------------------------------------------

_B9_ORACLE = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
FROM lineitem
WHERE (l_returnflag, l_linestatus) IN (('A', 'F'), ('N', 'O'))
  AND (l_suppkey % 10, l_linenumber) IN ((1, 1), (2, 2), (3, 1))
ORDER BY l_orderkey, l_linenumber
"""


@register("b9_tuple_in", oracle=_B9_ORACLE, tier="T3")
def b9_tuple_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key IN membership — CH tuple-IN / the multi-column
    routing predicate of replication filter configs. Both engines parse
    the row-value IN list natively; Spark compiles it to an OR-of-ANDs
    that pushes to the scan like any other predicate (asserted by the
    b-family pushdown tests' machinery).

    Scale: map-only; at large IN-lists switch to a broadcast semi join
    (c4) — same semantics, hash-build instead of expression tree."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("b9_lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        FROM b9_lineitem
        WHERE (l_returnflag, l_linestatus) IN (('A', 'F'), ('N', 'O'))
          AND (CAST(l_suppkey % 10 AS INT), l_linenumber)
              IN ((1, 1), (2, 2), (3, 1))
        """
    )


# ---------------------------------------------------------------------------
# b10_null_torture — null propagation discipline, pinned cross-engine
# ---------------------------------------------------------------------------

# Known cross-engine traps pinned here: Spark concat() returns NULL if
# ANY argument is NULL while DuckDB's skips them -> portable queries
# must use concat_ws (null-skipping on both). Aggregates over all-NULL
# groups return NULL (not 0) on both; COUNT(col) skips NULLs while
# COUNT(*) doesn't.
_B10_ORACLE = """
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS p,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE o_orderpriority END AS pri,
         o_orderkey % 7 AS g
  FROM orders
)
SELECT g,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(p) AS BIGINT) AS n_nonnull,
       MIN(p) AS min_p,
       COALESCE(MIN(p), -1.0) AS min_p_default,
       CAST(SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       concat_ws('/', CAST(g AS STRING), 'x') AS tag,
       CAST(SUM(CASE WHEN p + 1.0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS arith_null_propagates,
       CAST(SUM(CASE WHEN concat_ws('-', pri, 'suffix') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS concat_ws_never_null
FROM t
GROUP BY g
ORDER BY g
"""


@register("b10_null_torture", oracle=_B10_ORACLE, tier="T2")
def b10_null_torture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics discipline, pinned: COUNT(*) vs COUNT(col),
    aggregate-over-NULLs, arithmetic propagation (x + 1 stays NULL),
    and the concat trap — Spark's concat() NULLs out on any NULL input
    while DuckDB's skips, so the engine-portable spelling is concat_ws
    (null-skipping on BOTH, proven by the always-zero
    concat_ws_never_null column). The replication category lives on
    nullable MySQL columns; these are the rules that keep reports
    honest."""
    orders = load(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("p"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("pri"),
        (F.col("o_orderkey") % 7).alias("g"),
    )
    return (
        t.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("p").cast("long").alias("n_nonnull"),
            F.min("p").alias("min_p"),
            F.coalesce(F.min("p"), F.lit(-1.0)).alias("min_p_default"),
            F.sum(F.when(F.col("p").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.sum(F.when((F.col("p") + 1.0).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("arith_null_propagates"),
            F.sum(
                F.when(
                    F.concat_ws("-", F.col("pri"), F.lit("suffix")).isNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("concat_ws_never_null"),
        )
        .withColumn(
            "tag", F.concat_ws("/", F.col("g").cast("string"), F.lit("x"))
        )
        .select(
            "g", "n_rows", "n_nonnull", "min_p", "min_p_default", "n_null",
            "tag", "arith_null_propagates", "concat_ws_never_null",
        )
    )
