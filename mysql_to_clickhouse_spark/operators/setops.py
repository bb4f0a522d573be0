"""§2.F — sort / limit / set operations.

The driver's value-hash is order-insensitive, so pure ORDER BY would be
unverifiable; sort queries therefore surface an explicit ``pos`` column
(row_number over the same total order), making ordering part of the
hashed values.

Scale note: a global sort range-partitions by sampled split points
(Spark's SortExec over rangepartitioning) — fine; but top-k should
NEVER be sort-then-limit at scale: ``orderBy(...).limit(k)`` compiles
to TakeOrderedAndProject (per-partition heaps + driver merge), which is
what f2 demonstrates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.plans.prefix import global_row_number
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

# ---------------------------------------------------------------------------
# f1_order_multi — multi-key sort, mixed directions
# ---------------------------------------------------------------------------

_F1_ORACLE = """
SELECT CAST(ROW_NUMBER() OVER (
         ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
       ) AS BIGINT) AS pos,
       c_custkey, c_mktsegment, c_acctbal
FROM customer
ORDER BY pos
"""


@register("f1_order_multi", oracle=_F1_ORACLE, tier="T1")
def f1_order_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort (segment ASC, balance DESC, PK
    tie-break), with the resulting position materialized as a column so
    the order-insensitive hash still verifies ordering.

    Scale: the position comes from the two-phase prefix scan
    (plans/prefix.py) — a range-partitioned parallel sort plus 32
    broadcast offsets — not a single-partition row_number window."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    order = [
        F.col("c_mktsegment").asc_nulls_last(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    ]
    ranked, _n = global_row_number(cust, order, out_col="pos")
    return ranked.select(
        F.col("pos"), "c_custkey", "c_mktsegment", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# f2_limit_topk — ORDER BY ... LIMIT k (TakeOrderedAndProject)
# ---------------------------------------------------------------------------

_F2_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("f2_limit_topk", oracle=_F2_ORACLE, tier="T1")
def f2_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by price. orderBy+limit compiles to
    TakeOrderedAndProject: each task keeps a k-heap, the driver merges
    — no global sort, no full shuffle, at any scale."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# f3_union_all — concatenation, duplicates kept
# ---------------------------------------------------------------------------

_F3_ORACLE = """
SELECT 'pending' AS src, o_orderkey, o_totalprice
FROM orders WHERE o_orderstatus = 'P'
UNION ALL
SELECT 'urgent' AS src, o_orderkey, o_totalprice
FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY src, o_orderkey
"""


@register("f3_union_all", oracle=_F3_ORACLE)
def f3_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName (name-resolved, no silent positional
    mismatches). Overlapping rows appear twice — by design."""
    orders = load(spark, sf_dir, "orders")
    pending = orders.filter(F.col("o_orderstatus") == "P").select(
        F.lit("pending").alias("src"), "o_orderkey", "o_totalprice"
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src"), "o_orderkey", "o_totalprice"
    )
    return pending.unionByName(urgent)


# ---------------------------------------------------------------------------
# f4_union_distinct — concatenation + dedup
# ---------------------------------------------------------------------------

_F4_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
UNION
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
ORDER BY custkey
"""


@register("f4_union_distinct", oracle=_F4_ORACLE)
def f4_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): union + dedup collapses to one hash aggregate
    over the concatenation — partial dedup runs map-side."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    b = cust.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.union(b).distinct()


# ---------------------------------------------------------------------------
# f5_intersect / f6_except
# ---------------------------------------------------------------------------

_F5_ORACLE = """
SELECT DISTINCT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY custkey
"""


@register("f5_intersect", oracle=_F5_ORACLE)
def f5_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers who ordered in both 1996 and
    1997. Spark plans this as a left-semi join after dedup."""
    orders = load(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey"))

    return year(1996).intersect(year(1997))


_F6_ORACLE = """
SELECT DISTINCT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
EXCEPT
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY custkey
"""


@register("f6_except", oracle=_F6_ORACLE)
def f6_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): 1996 customers who did NOT order in 1997 —
    planned as a left-anti join after dedup."""
    orders = load(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey"))

    return year(1996).subtract(year(1997))


# ---------------------------------------------------------------------------
# f7_nulls_ordering — explicit NULLS FIRST / NULLS LAST sort semantics
# ---------------------------------------------------------------------------

_F7_ORACLE = """
WITH t AS (
  SELECT c_custkey, c_acctbal,
         NULLIF(c_mktsegment, 'BUILDING') AS seg_n
  FROM customer
)
SELECT CAST(ROW_NUMBER() OVER (
         ORDER BY seg_n ASC NULLS FIRST, c_acctbal DESC NULLS LAST,
                  c_custkey ASC
       ) AS BIGINT) AS pos,
       c_custkey, seg_n, c_acctbal
FROM t
ORDER BY pos
"""


@register("f7_nulls_ordering", oracle=_F7_ORACLE)
def f7_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null-placement sort semantics, exercised on REAL nulls
    (BUILDING nulled via NULLIF so ~1/5 of keys are NULL): NULLS FIRST
    on the ascending segment key, NULLS LAST on the descending balance
    — both engines state the placement explicitly since their defaults
    differ (Spark ASC=nulls-first, DuckDB ASC=nulls-last). Position is
    materialized so the order-insensitive hash still proves the total
    order."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_n"),
    )
    ranked, _n = global_row_number(
        cust,
        [
            F.col("seg_n").asc_nulls_first(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey").asc(),
        ],
        out_col="pos",
    )
    return ranked.select(F.col("pos"), "c_custkey", "seg_n", "c_acctbal")


# ---------------------------------------------------------------------------
# f8_pagination — stable keyset + offset pagination
# ---------------------------------------------------------------------------

_F8_ORACLE = """
WITH ordered AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         CAST(ROW_NUMBER() OVER (
           ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS pos
  FROM customer
)
SELECT pos, c_custkey, c_mktsegment, c_acctbal,
       CAST(CASE WHEN pos > 40 THEN 1 ELSE 0 END AS BIGINT) AS via_keyset
FROM ordered
WHERE pos BETWEEN 41 AND 60
ORDER BY pos
"""


@register("f8_pagination", oracle=_F8_ORACLE, tier="T3")
def f8_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable pagination (page 3 at 20 rows/page) over a total order —
    the API-backend pattern, done the way that scales: materialized
    position from row_number over (sort key, PK tie-break), sliced by
    position range. OFFSET/LIMIT without a total order returns
    arbitrary pages; with the keyset position the page is deterministic
    and the driver hash can prove it.

    Scale: TakeOrdered-style evaluation — per-partition top-(offset+
    limit) heaps then one driver merge; at deep offsets switch to
    keyset continuation (WHERE (bal, key) < last_seen), which this
    layout makes a pure filter."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    ordered, _n = global_row_number(
        cust,
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        out_col="pos",
    )
    return ordered.filter(F.col("pos").between(41, 60)).select(
        "pos",
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.when(F.col("pos") > 40, 1).otherwise(0).cast("long").alias(
            "via_keyset"
        ),
    )


# ---------------------------------------------------------------------------
# f9_bag_setops — INTERSECT ALL / EXCEPT ALL (multiplicity-preserving)
# ---------------------------------------------------------------------------

# Bag semantics matter precisely when the rows are NOT distinct: a
# (user, type) pair occurring 5x early and 3x late must survive
# INTERSECT ALL exactly 3x and EXCEPT ALL exactly 2x. The distinct
# variants (f5/f6) erase that arithmetic.
_F9_ORACLE = """
WITH early AS (
  SELECT user_id, event_type FROM events
  WHERE ts < TIMESTAMP '2024-01-11'
), late AS (
  SELECT user_id, event_type FROM events
  WHERE ts >= TIMESTAMP '2024-01-21'
), both_all AS (
  SELECT 'both' AS tag, user_id, event_type
  FROM (SELECT * FROM early INTERSECT ALL SELECT * FROM late)
), only_early AS (
  SELECT 'only_early' AS tag, user_id, event_type
  FROM (SELECT * FROM early EXCEPT ALL SELECT * FROM late)
)
SELECT tag, user_id, event_type FROM both_all
UNION ALL
SELECT tag, user_id, event_type FROM only_early
ORDER BY tag, user_id, event_type
"""


@register("f9_bag_setops", oracle=_F9_ORACLE, tier="T3")
def f9_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI bag-semantics set ops — ``INTERSECT ALL`` (min of the two
    multiplicities survives) and ``EXCEPT ALL`` (count difference
    survives) between the early and late (user, type) activity bags.
    Spark's ``intersectAll``/``exceptAll`` plan these as a count
    aggregate per side + a generate — no row-by-row matching — and the
    driver hash proves the multiplicity arithmetic against DuckDB's
    native INTERSECT ALL / EXCEPT ALL.

    Scale: each side reduces to (row-key, count) — one hash aggregate
    per side, one join on the row key, then a bounded sequence
    Generate; the shuffle carries distinct rows + counts, not the raw
    bags."""
    ev = load(spark, sf_dir, "events")
    early = ev.filter(
        F.col("ts") < F.lit("2024-01-11").cast("timestamp")
    ).select("user_id", "event_type")
    late = ev.filter(
        F.col("ts") >= F.lit("2024-01-21").cast("timestamp")
    ).select("user_id", "event_type")
    both = early.intersectAll(late).select(
        F.lit("both").alias("tag"), "user_id", "event_type"
    )
    only_early = early.exceptAll(late).select(
        F.lit("only_early").alias("tag"), "user_id", "event_type"
    )
    return both.unionAll(only_early)
