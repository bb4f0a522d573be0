"""§2.C — joins (inner/outer/semi/anti/multikey/cross/theta/as-of/star).

Strategy notes that survive a 1000-executor scale-up:

- Dimension sides (region/nation/customer/supplier/part) are broadcast
  explicitly (`F.broadcast`) — no shuffle of the fact table for those.
- Fact-fact joins (self-joins, multikey) shuffle both sides on the join
  key once; AQE handles skew splitting at runtime.
- The theta/band join keeps the tiny side (bucket bounds) broadcast so
  the nested-loop never materializes a cartesian of two big inputs.
- The as-of join is a single window pass over a union — one shuffle by
  key, no per-row subqueries (the pattern that scales; a correlated
  subquery would not).

NULL policy for verified outputs: outer-join nulls are COALESCE'd to
typed sentinels on both engines — null→pandas representation differs
between engines (None vs NaN) and would break value hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import dsum, epoch_us, o_dsum
from mysql_to_clickhouse_spark.plans.dispatch import broadcast_when_small
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import (
    bucket_routed_key,
    load,
    load_dim,
    load_flat_lineitem,
)

# ---------------------------------------------------------------------------
# c1_inner_equi — orders ⋈ customer (row-level check)
# ---------------------------------------------------------------------------

_C1_ORACLE = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey
"""


@register("c1_inner_equi", oracle=_C1_ORACLE, tier="T1")
def c1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact→dim, checked row-for-row.

    customer is dimension-sized → broadcast-hash join: zero shuffle of
    orders at any scale."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
        
    )


# ---------------------------------------------------------------------------
# c2_left_outer — customers keep rows with no orders
# ---------------------------------------------------------------------------

_C2_ORACLE = """
SELECT
  c_custkey,
  COALESCE(o_orderkey, -1) AS o_orderkey,
  COALESCE(o_totalprice, 0.0) AS o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
ORDER BY c_custkey, o_orderkey
"""


@register("c2_left_outer", oracle=_C2_ORACLE)
def c2_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; unmatched customers surface with sentinel keys
    (see module NULL policy)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("o_orderkey", F.lit(-1)).alias("o_orderkey"),
            F.coalesce("o_totalprice", F.lit(0.0)).alias("o_totalprice"),
        )
        
    )


# ---------------------------------------------------------------------------
# c3_right_full_outer — both unmatched directions
# ---------------------------------------------------------------------------

_C3_ORACLE = """
WITH big_buyers AS (
  SELECT o_custkey, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
), rich AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
)
SELECT
  COALESCE(b.o_custkey, r.c_custkey) AS custkey,
  COALESCE(b.n_orders, -1) AS n_orders,
  COALESCE(r.c_acctbal, -1.0) AS acctbal
FROM big_buyers b FULL OUTER JOIN rich r ON b.o_custkey = r.c_custkey
ORDER BY custkey
"""


@register("c3_right_full_outer", oracle=_C3_ORACLE)
def c3_right_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on BOTH sides (frequent
    buyers vs rich customers); right-only direction covered by
    c3b_right_outer."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )
    rich = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    return (
        big.join(rich, big.o_custkey == rich.c_custkey, "full")
        .select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            F.coalesce("n_orders", F.lit(-1)).alias("n_orders"),
            F.coalesce("c_acctbal", F.lit(-1.0)).alias("acctbal"),
        )
        
    )


_C3B_ORACLE = """
SELECT
  c_custkey,
  COALESCE(o.n_orders, 0) AS n_orders
FROM (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
) o RIGHT JOIN customer ON o.o_custkey = c_custkey
ORDER BY c_custkey
"""


@register("c3b_right_outer", oracle=_C3B_ORACLE)
def c3b_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (all customers kept, order counts attached)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey, "right")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
        
    )


# ---------------------------------------------------------------------------
# c4_semi / c5_anti — EXISTS / NOT EXISTS
# ---------------------------------------------------------------------------

_C4_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


@register("c4_semi", oracle=_C4_ORACLE)
def c4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one order.
    Semi joins ship only the distinct keys of the right side — far
    cheaper than join+distinct at scale."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        
    )


_C5_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


@register("c5_anti", oracle=_C5_ORACLE)
def c5_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        
    )


# ---------------------------------------------------------------------------
# c6_multikey — composite-key self join
# ---------------------------------------------------------------------------

_C6_ORACLE = """
SELECT a.l_orderkey, a.l_partkey,
       a.l_linenumber AS ln_a, b.l_linenumber AS ln_b
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey
 AND a.l_partkey = b.l_partkey
 AND a.l_linenumber < b.l_linenumber
ORDER BY a.l_orderkey, a.l_partkey, ln_a, ln_b
"""


@register("c6_multikey", oracle=_C6_ORACLE)
def c6_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column equi join: pairs of lineitems in the same order for
    the same part. Both sides shuffle once on the composite key
    (orderkey, partkey); the < predicate is applied post-match."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            [
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_partkey") == F.col("b.l_partkey"),
                F.col("a.l_linenumber") < F.col("b.l_linenumber"),
            ],
        )
        .select(
            F.col("a.l_orderkey").alias("l_orderkey"),
            F.col("a.l_partkey").alias("l_partkey"),
            F.col("a.l_linenumber").alias("ln_a"),
            F.col("b.l_linenumber").alias("ln_b"),
        )
        
    )


# ---------------------------------------------------------------------------
# c7_cross — cartesian product (small inputs only)
# ---------------------------------------------------------------------------

_C7_ORACLE = """
SELECT r_name, n_name
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
"""


@register("c7_cross", oracle=_C7_ORACLE)
def c7_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product — only ever between bounded inputs
    (5 × 25 here); Spark rightly makes you opt in via crossJoin."""
    region = load(spark, sf_dir, "region").select("r_name")
    nation = load(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


# ---------------------------------------------------------------------------
# c8_theta_range — band join (value BETWEEN lo AND hi)
# ---------------------------------------------------------------------------

_C8_ORACLE = f"""
WITH buckets AS (
  SELECT i AS bucket_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
  FROM range(10) t(i)
)
SELECT bucket_id, lo, hi, COUNT(*) AS n_events, {o_dsum('value')} AS sum_value
FROM events JOIN buckets ON value >= lo AND value < hi
GROUP BY bucket_id, lo, hi
ORDER BY bucket_id
"""


@register("c8_theta_range", oracle=_C8_ORACLE)
def c8_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (band) join: events against derived value buckets.

    The bucket table is tiny → broadcast nested-loop join, so the fact
    side streams through once, never materializing a cartesian. For
    big-big band joins, pre-bucket both sides on FLOOR(value/width) and
    equi-join first (that rewrite is what scales)."""
    ev = load(spark, sf_dir, "events")
    buckets = (
        spark.range(10)
        .select(
            F.col("id").alias("bucket_id"),
            (F.col("id") * 50.0).alias("lo"),
            ((F.col("id") + 1) * 50.0).alias("hi"),
        )
    )
    return (
        ev.join(
            F.broadcast(buckets),
            (ev.value >= buckets.lo) & (ev.value < buckets.hi),
        )
        .groupBy("bucket_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        
    )


# ---------------------------------------------------------------------------
# c9_asof — as-of join: latest 'view' at-or-before each 'purchase'
# ---------------------------------------------------------------------------

_C9_ORACLE = """
WITH tagged AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         event_type, value
  FROM events WHERE event_type IN ('view', 'purchase')
), chained AS (
  SELECT user_id, event_id, ts_us, event_type, value,
         MAX(CASE WHEN event_type = 'view' THEN ts_us END) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_view_us
  FROM tagged
)
SELECT event_id, user_id, ts_us, COALESCE(last_view_us, -1) AS last_view_us, value
FROM chained
WHERE event_type = 'purchase'
ORDER BY event_id
"""


@register("c9_asof", oracle=_C9_ORACLE, tier="T3")
def c9_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union+window trick: one pass, one shuffle.

    Instead of a per-row 'latest earlier match' lookup (quadratic or
    index-dependent), union both streams, order by time within key, and
    carry the last seen left-side timestamp forward with a running MAX
    window. This is the scalable formulation: a single shuffle by
    user_id regardless of data size (DuckDB's native ASOF JOIN would
    verify the same semantics; we use the identical window form as the
    oracle)."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chained = tagged.withColumn(
        "last_view_us",
        F.max(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
    )
    return (
        chained.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.coalesce("last_view_us", F.lit(-1)).alias("last_view_us"),
            "value",
        )
        
    )


# ---------------------------------------------------------------------------
# c10_star_multiway — TPC-H Q5 shape: 6-table star join
# ---------------------------------------------------------------------------

_C10_ORACLE = f"""
SELECT
  n_name,
  {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM region
  JOIN nation ON n_regionkey = r_regionkey
  JOIN customer ON c_nationkey = n_nationkey
  JOIN orders ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("c10_star_multiway", oracle=_C10_ORACLE)
def c10_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue by nation (TPC-H Q5 shape).

    Join order: reduce early, facts last. region/nation/customer fold
    into a broadcast dim that shrinks orders to ASIA customers in the
    date window BEFORE the only shuffle join (orders⋈lineitem on
    orderkey) — ~1/6 of orders ship through the exchange instead of
    all of them. The s_nationkey = c_nationkey 'local' predicate rides
    on the supplier broadcast join after the fact join. Date filter
    pushes into the orders scan. When the fact scan is large enough
    that its shuffle WRITE dominates (AQE can only localize the read),
    the size-gated probe (plans/dispatch.py) spends one count job on
    the reduced orders side and broadcasts it if genuinely small, so
    lineitem never shuffle-writes (1e8-tier numbers in
    docs/BENCH_SCALE.md); at sf0.1 the gate keeps the plan
    byte-identical. Under the flat lineitem⨝orders MV
    (tables.ensure_flat_lineitem) the fact join disappears: the date
    window prunes o_month directories and o_custkey rides the fact
    row, leaving only dim broadcasts before the final aggregate."""
    # dims read through the dimension cache (tables.load_dim): the
    # session's second and later fresh-built plans scan in-memory
    # relations instead of re-decoding parquet — ~0.35 s of the q5
    # fresh-submission constant at the 1e8 tier
    region = load_dim(spark, sf_dir, "region")
    nation = load_dim(spark, sf_dir, "nation")
    cust = load_dim(spark, sf_dir, "customer")
    supp = load_dim(spark, sf_dir, "supplier")

    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select("c_custkey", "c_nationkey", "n_name")
    )
    # file-based MV read: q5 groups on n_name, not the bucket key, so
    # the pruned scan coalesces into full splits, not 64 bucket tasks
    flat = load_flat_lineitem(spark, sf_dir, bucketed=False)
    if flat is not None:
        # flat lineitem⨝orders MV: the date window prunes o_quarter
        # directories (8 of ~24) and o_custkey rides the fact row, so
        # the only joins left are the dim broadcasts — zero fact-side
        # exchanges before the |nations|-sized aggregate
        # o_quarter ∈ [19961, 19974] IS the two-year window — the
        # partition value derives exactly from o_orderdate, so no
        # residual timestamp filter and the scan never decodes
        # o_orderdate at all (column pruning + dir pruning)
        fact = flat.filter(
            F.col("o_quarter").between(19961, 19974)
        ).join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
    else:
        orders = load(spark, sf_dir, "orders")
        li = load(spark, sf_dir, "lineitem")
        orders_f = orders.filter(
            (
                F.col("o_orderdate")
                >= F.lit("1996-01-01 00:00:00").cast("timestamp")
            )
            & (
                F.col("o_orderdate")
                < F.lit("1998-01-01 00:00:00").cast("timestamp")
            )
        )
        small_orders = (
            orders_f.join(
                F.broadcast(dims), orders_f.o_custkey == dims.c_custkey
            )
            .select("o_orderkey", "c_nationkey", "n_name")
        )
        if bucket_routed_key(spark, sf_dir, "lineitem") == "l_orderkey" and (
            bucket_routed_key(spark, sf_dir, "orders") == "o_orderkey"
        ):
            # co-bucketed layout: per-bucket hash join beats broadcasting
            # a millions-row reduced-orders build per run (the q3/x6
            # lesson)
            small_orders = small_orders.hint("shuffle_hash")
        else:
            small_orders = broadcast_when_small(small_orders, li, spark)
        fact = li.join(small_orders, li.l_orderkey == small_orders.o_orderkey)
    return (
        fact.join(
            F.broadcast(supp),
            (F.col("l_suppkey") == supp.s_suppkey)
            & (supp.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# c11_self_join — pairs within a table
# ---------------------------------------------------------------------------

_C11_ORACLE = """
SELECT a.label, COUNT(*) AS n_pairs
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
GROUP BY a.label
ORDER BY a.label
"""


@register("c11_self_join", oracle=_C11_ORACLE)
def c11_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self join: same-label embedding pairs (a.id < b.id dedup).

    The equi key (label) carries the shuffle; the inequality prunes the
    pair triangle. At 100 TB this is the blocked/bucketed pattern every
    near-dup pipeline uses — never a cross join."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(
            b,
            [
                F.col("a.label") == F.col("b.label"),
                F.col("a.vec_id") < F.col("b.vec_id"),
            ],
        )
        .groupBy(F.col("a.label").alias("label"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        
    )


# ---------------------------------------------------------------------------
# c12_q3_shipping — TPC-H Q3 shape (bench headline q3_shipping_priority)
# ---------------------------------------------------------------------------

_C12_ORACLE = f"""
SELECT l_orderkey,
       {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("c12_q3_shipping", oracle=_C12_ORACLE)
def c12_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-10 (TPC-H Q3 shape): reduce-early join
    order — segment-filtered customers broadcast into orders FIRST, so
    the one shuffle join against lineitem carries only the ~1/5 of
    orders that survive the segment (Catalyst does not reorder
    user-written joins without CBO stats, so the reduction must be
    stated). Grouped revenue, TakeOrdered top-10 with full tie-break.

    Scale: the build side shrinks 5x before it ships, and the
    post-join aggregation input shrinks with it — measured 14.2 s ->
    6.3 s warm at the 1e8-row tier purely from the reorder
    (docs/BENCH_SCALE.md). The remaining cost is the lineitem shuffle
    WRITE, which AQE cannot avoid (it only localizes the read); the
    size-gated probe (plans/dispatch.py) removes it when one count job
    proves the reduced orders side broadcast-small. At sf0.1 the fact
    gate leaves the plan byte-identical.

    With the bucketed layout routed (tables.ensure_bucketed), both
    sides already carry HashPartitioning(orderkey): a shuffle-hash
    join then beats BOTH alternatives — no exchange on either side,
    no sort (sort-merge re-sorts 3.3e7 rows per run), and no per-run
    broadcast hash-relation rebuild, whose cost scales with the
    reduced-orders side (2.4e6 rows at 1e8). Measured 2.5 s -> 1.6 s
    warm at the 1e8 tier; the groupBy reuses the join's orderkey
    partitioning either way."""
    cust = load_dim(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    # bucketed MV read (not path-based): the groupBy includes
    # l_orderkey, so the bucket clustering keeps it exchange-free —
    # the x7 shape, with the o_orderdate window pruning quarter
    # directories on top (< 1998-01-01 aligns exactly with
    # o_quarter <= 19974, so no residual timestamp decode)
    flat = load_flat_lineitem(spark, sf_dir)
    if flat is not None:
        joined = flat.filter(
            (F.col("o_quarter") <= 19974)
            & (F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp"))
        ).join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    else:
        orders = load(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
        )
        li = load(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp")
        )
        small_orders = (
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_orderdate", "o_orderpriority")
        )
        if bucket_routed_key(spark, sf_dir, "lineitem") == "l_orderkey" and (
            bucket_routed_key(spark, sf_dir, "orders") == "o_orderkey"
        ):
            small_orders = small_orders.hint("shuffle_hash")
        else:
            small_orders = broadcast_when_small(small_orders, li, spark)
        joined = li.join(
            small_orders, li.l_orderkey == small_orders.o_orderkey
        )
    return (
        joined
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# c14_shuffle_hash_join — explicit join-strategy control
# ---------------------------------------------------------------------------

_C14_ORACLE = f"""
SELECT o_orderstatus,
       COUNT(*) AS n,
       {o_dsum('l_extendedprice')} AS total_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("c14_shuffle_hash_join", oracle=_C14_ORACLE)
def c14_shuffle_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join under an explicit SHUFFLE_HASH hint: when neither
    side broadcasts and the build side fits per-partition memory, hash
    beats sort-merge (no sort phase). The hint surface is how a query
    author overrides Catalyst when cardinality estimates are wrong —
    results are strategy-invariant, which is exactly what the oracle
    checks."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.hint("shuffle_hash")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# c15_null_safe_join — join where NULL keys match (MySQL <=> semantics)
# ---------------------------------------------------------------------------

_C15_ORACLE = """
WITH t AS (
  SELECT n_nationkey, n_name, NULLIF(n_regionkey, 0) AS grp FROM nation
)
SELECT a.n_nationkey AS key_a, b.n_nationkey AS key_b,
       a.n_name AS name_a, b.n_name AS name_b,
       (a.grp IS NULL) AS null_group
FROM t a
JOIN t b
  ON a.grp IS NOT DISTINCT FROM b.grp
 AND a.n_nationkey < b.n_nationkey
ORDER BY key_a, key_b
"""


@register("c15_null_safe_join", oracle=_C15_ORACLE, tier="T2")
def c15_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (MySQL's <=>, SQL IS NOT DISTINCT FROM):
    rows whose join key is NULL match EACH OTHER instead of vanishing —
    the replication-layer semantics for nullable MySQL keys. Spark's
    eqNullSafe plans as a plain equi join (hash/SMJ), so NULL keys form
    one ordinary group; at scale a hot NULL group is exactly a skew key
    (salt it like c13 if it dominates)."""
    nation = load(spark, sf_dir, "nation")
    t = nation.select(
        "n_nationkey",
        "n_name",
        F.expr("nullif(n_regionkey, 0)").alias("grp"),
    )
    a = t.select(
        F.col("n_nationkey").alias("key_a"),
        F.col("n_name").alias("name_a"),
        F.col("grp").alias("grp_a"),
    )
    b = t.select(
        F.col("n_nationkey").alias("key_b"),
        F.col("n_name").alias("name_b"),
        F.col("grp").alias("grp_b"),
    )
    return (
        a.join(
            b,
            F.col("grp_a").eqNullSafe(F.col("grp_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .select(
            "key_a",
            "key_b",
            "name_a",
            "name_b",
            F.col("grp_a").isNull().alias("null_group"),
        )
    )


# ---------------------------------------------------------------------------
# c16_merge_join_hint — physical-strategy control: sort-merge join
# ---------------------------------------------------------------------------

_C16_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("c16_merge_join_hint", oracle=_C16_ORACLE)
def c16_merge_join_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit physical-strategy control: the MERGE hint forces a
    sort-merge join for the fact-fact pair (the complement of c14's
    SHUFFLE_HASH). When both sides are large and neither fits a hash
    table per task — the 100 TB fact⋈fact regime — sort-merge is the
    strategy that degrades gracefully: it spills sorted runs instead
    of OOMing a hash table, and with bucketed/sorted source layouts
    (a9) the sort phase disappears entirely. Result-identical to the
    optimizer's own choice, which the hash check proves."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.hint("merge")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# c17_asof_forward — forward as-of: EARLIEST purchase strictly after a view
# ---------------------------------------------------------------------------

_C17_ORACLE = """
WITH v AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events WHERE event_type = 'view'
)
SELECT v.user_id,
       v.event_id AS view_event_id,
       v.ts_us AS view_us,
       p.event_id AS next_purchase_id,
       p.p_us AS purchase_us
FROM v, LATERAL (
  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
  FROM events p
  WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
    AND epoch_us(CAST(p.ts AS TIMESTAMP)) > v.ts_us
  ORDER BY p_us, event_id LIMIT 1
) p
ORDER BY view_event_id
"""


@register("c17_asof_forward", oracle=_C17_ORACLE, tier="T3")
def c17_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (CH ASOF JOIN with ``>`` direction): each
    view matched to the EARLIEST purchase strictly after it, per user —
    c9's mirror, the time-to-conversion primitive.

    Same distributed shape as c9: union both sides with a marker and
    run ONE ordered window per user — never the naive O(n·m)
    inequality join the oracle's LATERAL spells. Strictness is encoded
    in the sort, not a post-filter: at equal ts the purchase marker
    (0) sorts BEFORE the view (1), so the view's strictly-following
    frame can never capture a same-instant purchase, while
    first(..., ignorenulls) over that frame picks the (ts, event_id)-
    least purchase after it. Unmatched views drop (inner as-of)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("event_type") == "view").cast("int").alias("d"),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "p_id"
        ),
        F.when(
            F.col("event_type") == "purchase", F.unix_micros("ts")
        ).alias("p_us"),
    )
    # "first purchase strictly after me" via a REVERSED-order running
    # frame: the natural [1, unboundedFollowing] frame makes Spark
    # re-scan the suffix per row (unbounded-following frames are not
    # maintained incrementally — O(rows²) per user on purchase-sparse
    # tails). Over (ts_us, d, event_id) DESC the same strictly-after
    # row set is [unboundedPreceding, -1], a growing frame Spark
    # updates incrementally, and the LAST non-null scanning desc is
    # exactly the FIRST non-null scanning asc — value-identical
    # (oracle re-proven), one exchange either way.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts_us"), F.desc("d"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.select(
            "user_id",
            "event_id",
            "ts_us",
            "d",
            F.last("p_id", ignorenulls=True).over(w).alias("next_purchase_id"),
            F.last("p_us", ignorenulls=True).over(w).alias("purchase_us"),
        )
        .filter((F.col("d") == 1) & F.col("next_purchase_id").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("view_event_id"),
            F.col("ts_us").alias("view_us"),
            "next_purchase_id",
            "purchase_us",
        )
    )


# ---------------------------------------------------------------------------
# c18_asof_tolerance — as-of join with a max-staleness bound
# ---------------------------------------------------------------------------

_C18_TOL_US = 3_600_000_000  # 1 hour

_C18_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         event_type, value
  FROM events
  WHERE event_type IN ('view', 'purchase')
), chained AS (
  SELECT user_id, event_id, ts_us, event_type, value,
         MAX(CASE WHEN event_type = 'view' THEN ts_us END) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_view_us
  FROM tagged
)
SELECT event_id, user_id, ts_us,
       CAST(CASE WHEN last_view_us IS NOT NULL
                  AND ts_us - last_view_us <= {_C18_TOL_US}
                 THEN last_view_us ELSE -1 END AS BIGINT) AS matched_view_us,
       CAST(CASE WHEN last_view_us IS NOT NULL
                  AND ts_us - last_view_us <= {_C18_TOL_US}
                 THEN ts_us - last_view_us ELSE -1 END AS BIGINT)
         AS staleness_us,
       value
FROM chained
WHERE event_type = 'purchase'
ORDER BY event_id
"""


@register("c18_asof_tolerance", oracle=_C18_ORACLE, tier="T3")
def c18_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas ``merge_asof
    tolerance=`` / QuestDB ``ASOF JOIN TOLERANCE``): each purchase
    matches its latest preceding view ONLY if that view is at most 1
    hour stale — older context is considered expired and reported as
    unmatched (-1). Same single union+running-max window shuffle as c9;
    the tolerance is a post-window comparison, so bounding staleness
    costs nothing extra at any scale. The staleness itself is surfaced
    for latency-distribution audits."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chained = tagged.withColumn(
        "last_view_us",
        F.max(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
    )
    ok = F.col("last_view_us").isNotNull() & (
        (F.col("ts_us") - F.col("last_view_us")) <= _C18_TOL_US
    )
    return (
        chained.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.when(ok, F.col("last_view_us")).otherwise(-1)
            .cast("long")
            .alias("matched_view_us"),
            F.when(ok, F.col("ts_us") - F.col("last_view_us")).otherwise(-1)
            .cast("long")
            .alias("staleness_us"),
            "value",
        )
    )


# ---------------------------------------------------------------------------
# c19_cidr_enrich — IP-to-block enrichment as an arithmetic equi join
# ---------------------------------------------------------------------------

# 32 regular /5 blocks (width 2^27) over the IPv4 space; with regular
# blocks the BETWEEN lookup is block_id = ipnum div 2^27 — an EQUI
# join against the broadcast dim instead of an inequality join (the
# non-equi form plans BroadcastNestedLoop, which detonates at scale).
_C19_ORACLE = """
WITH ip AS (
  SELECT c_custkey, (c_custkey * 2654435761) % 4294967296 AS ipnum
  FROM customer
), blocks AS (
  SELECT i AS block_id,
         i * 134217728 AS lo,
         (i + 1) * 134217728 - 1 AS hi,
         concat('net-', lpad(CAST(i AS VARCHAR), 2, '0')) AS block_name
  FROM (SELECT unnest(range(32)) AS i)
)
SELECT b.block_name,
       CAST(b.lo AS BIGINT) AS lo,
       CAST(COUNT(*) AS BIGINT) AS n_ips,
       CAST(MIN(ip.ipnum) AS BIGINT) AS min_ip,
       CAST(MAX(ip.ipnum) AS BIGINT) AS max_ip
FROM ip JOIN blocks b ON ip.ipnum // 134217728 = b.block_id
GROUP BY b.block_name, b.lo
ORDER BY b.block_name
"""


@register("c19_cidr_enrich", oracle=_C19_ORACLE, tier="T3")
def c19_cidr_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP→network-block enrichment (the GeoIP/CIDR lookup every event
    pipeline runs): each address joins its covering block. The naive
    spelling is a BETWEEN range join — a BroadcastNestedLoop that
    detonates at scale; with regular blocks the lookup collapses to
    block_id = ipnum div width, a broadcast EQUI join (for irregular
    CIDR tables: explode each prefix to its covering fixed-width
    buckets once, then the same equi join). Plan: one broadcast hash
    join, zero fact-side shuffle before the aggregate."""
    cust = load(spark, sf_dir, "customer")
    ip = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 2654435761) % 4294967296).alias("ipnum"),
    )
    blocks = spark.range(32).select(
        F.col("id").alias("block_id"),
        (F.col("id") * 134217728).alias("lo"),
        F.concat(
            F.lit("net-"), F.lpad(F.col("id").cast("string"), 2, "0")
        ).alias("block_name"),
    )
    j = ip.withColumn("block_id", F.expr("ipnum div 134217728")).join(
        F.broadcast(blocks), "block_id"
    )
    return (
        j.groupBy("block_name", "lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ips"),
            F.min("ipnum").cast("long").alias("min_ip"),
            F.max("ipnum").cast("long").alias("max_ip"),
        )
        .select(
            "block_name",
            F.col("lo").cast("long").alias("lo"),
            "n_ips",
            "min_ip",
            "max_ip",
        )
    )


# ---------------------------------------------------------------------------
# c20_paste_join — CH PASTE JOIN: positional (row-number) join
# ---------------------------------------------------------------------------

_C20_ORACLE = """
WITH by_spend AS (
  SELECT user_id AS spend_user,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT) AS spend_fp,
         ROW_NUMBER() OVER (
           ORDER BY SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) DESC, user_id
         ) AS rn
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), by_activity AS (
  SELECT user_id AS active_user,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rn
  FROM events GROUP BY user_id
)
SELECT s.rn AS rank, s.spend_user, s.spend_fp, a.active_user, a.n_events
FROM by_spend s JOIN by_activity a ON s.rn = a.rn
WHERE s.rn <= 20
ORDER BY rank
"""


@register("c20_paste_join", oracle=_C20_ORACLE, tier="T3")
def c20_paste_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``PASTE JOIN``: join two result sets BY ROW POSITION — row i
    of the left pairs with row i of the right. Positional semantics
    only exist relative to an explicit total order, so each side is
    ranked by its own deterministic ORDER BY (CH itself documents the
    subquery-order caveat) and the paste is an equi-join on that rank
    — here pairing the i-th biggest spender with the i-th most active
    user (the leaderboard-comparison report).

    Scale: each side is a hash aggregate; only ranks <= 20 survive the
    paste, so each side is PRE-CAPPED with orderBy().limit(20) —
    Spark's TakeOrderedAndProject keeps a 20-row heap per partition
    and merges heaps on the driver — before the rank window runs. The
    window is still unpartitioned, but its input is 20 rows by
    construction at ANY data size (whitelisted in the no-global-window
    plan guard for exactly that reason)."""
    ev = load(spark, sf_dir, "events")
    spend_fp = F.sum(
        F.floor(F.col("value") * F.lit(10000.0)).cast("long")
    ).cast("long")
    by_spend = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("spend_user"))
        .agg(spend_fp.alias("spend_fp"))
        .orderBy(F.col("spend_fp").desc(), F.col("spend_user"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("spend_fp").desc(), F.col("spend_user"))
            ),
        )
    )
    by_activity = (
        ev.groupBy(F.col("user_id").alias("active_user"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("active_user"))
        .limit(20)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("n_events").desc(), F.col("active_user"))
            ),
        )
    )
    return (
        by_spend.filter(F.col("rank") <= 20)
        .join(by_activity, by_spend.rank == by_activity.rn)
        .select("rank", "spend_user", "spend_fp", "active_user", "n_events")
    )


# ---------------------------------------------------------------------------
# c21_or_key_join — OR-of-keys join decomposed to a union of equi-joins
# ---------------------------------------------------------------------------

# The oracle states the join the way a user writes it (ON a OR b) —
# which a naive planner executes as a nested loop. The engine ships the
# rewrite: one equi-join per disjunct, UNION ALL (the disjuncts are
# mutually exclusive by construction: a key cannot equal both x and
# x-1000), proven semantics-preserving by the driver hash.
_C21_ORACLE = """
SELECT o.o_orderkey, c.c_custkey,
       CASE WHEN c.c_custkey = o.o_custkey THEN 'direct'
            ELSE 'legacy' END AS match_via
FROM orders o JOIN customer c
  ON c.c_custkey = o.o_custkey OR c.c_custkey = o.o_custkey - 1000
ORDER BY o_orderkey, c_custkey
"""


@register("c21_or_key_join", oracle=_C21_ORACLE, tier="T3")
def c21_or_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-reconciliation join during a migration: an order matches a
    customer by the CURRENT key (o_custkey) OR by a LEGACY id offset —
    the ``ON a OR b`` join every cutover validation writes. Written
    literally, both Spark and ClickHouse plan a nested loop over
    fact×dim; the engine decomposes it into one broadcast equi-join
    per disjunct and UNION ALLs the branches (disjuncts are mutually
    exclusive here, so no pair dedup is needed — the general rewrite
    adds a distinct on the pair key). The driver hash against the
    verbatim OR form proves the rewrite.

    Scale: two broadcast probes of the same fact scan instead of a
    BroadcastNestedLoopJoin that compares every (order, customer)
    pair — the difference between O(|fact|) and O(|fact|·|dim|);
    plan-asserted in tests/test_plans.py."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    direct = orders.join(
        F.broadcast(cust), cust.c_custkey == orders.o_custkey
    ).select("o_orderkey", "c_custkey", F.lit("direct").alias("match_via"))
    legacy = orders.join(
        F.broadcast(cust), cust.c_custkey == orders.o_custkey - 1000
    ).select("o_orderkey", "c_custkey", F.lit("legacy").alias("match_via"))
    return direct.unionAll(legacy)


# ---------------------------------------------------------------------------
# c22_any_join — ClickHouse ANY LEFT JOIN (at most one right row per key)
# ---------------------------------------------------------------------------

# ClickHouse `LEFT ANY JOIN` keeps AT MOST ONE right-side row per join
# key (the first one the hash-table build encounters). "First" is
# nondeterministic in CH; the engine pins a stated keep-one rule so the
# result is reproducible and hash-checkable: the earliest order per
# customer (min o_orderdate, tie-broken by o_orderkey). The oracle
# states the identical rule via ROW_NUMBER ... = 1.
_C22_ORACLE = """
WITH one AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS od_us
  FROM orders
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY o_custkey
    ORDER BY epoch_us(CAST(o_orderdate AS TIMESTAMP)), o_orderkey) = 1
)
SELECT c.c_custkey, c.c_name,
       COALESCE(one.o_orderkey, -1) AS first_orderkey,
       COALESCE(one.od_us, -1) AS first_order_us,
       one.o_custkey IS NOT NULL AS matched
FROM customer c LEFT JOIN one ON c.c_custkey = one.o_custkey
ORDER BY c.c_custkey
"""


@register("c22_any_join", oracle=_C22_ORACLE, tier="T3")
def c22_any_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LEFT ANY JOIN``: each left row pairs with at most
    ONE right row per key — the replication-user idiom for joining a
    fact against a multi-version dimension without row multiplication.
    CH keeps an arbitrary first match; the engine makes the keep-one
    rule explicit and deterministic (earliest o_orderdate, tie-break
    o_orderkey) so ANY JOIN results are reproducible across runs.
    ``ANY INNER`` is this result filtered to ``matched``.

    Spark shape: dedup-right-then-join. The dedup is min(struct(...)) —
    a partial-aggregable JVM path (map-side combine shrinks the right
    side BEFORE its shuffle, exactly like CH's build-side hash table
    keeping one row per key), NOT a row_number window (full shuffle of
    every version). The deduped side is then broadcast — CH's ANY JOIN
    requires the build side to fit memory, and the Spark analog is the
    broadcast hash join (plan-pinned in tests/test_plans.py); at a
    scale where the deduped dimension outgrows the driver, drop the
    hint and the same plan degrades to a shuffle hash join with
    identical semantics."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load(spark, sf_dir, "orders")
    one = (
        orders.select(
            "o_custkey",
            F.struct(
                epoch_us("o_orderdate").alias("od_us"),
                F.col("o_orderkey").alias("o_orderkey"),
            ).alias("v"),
        )
        .groupBy("o_custkey")
        .agg(F.min("v").alias("v"))
        .select(
            "o_custkey",
            F.col("v.o_orderkey").alias("first_orderkey"),
            F.col("v.od_us").alias("first_order_us"),
        )
    )
    joined = cust.join(
        F.broadcast(one), cust.c_custkey == one.o_custkey, "left"
    )
    return joined.select(
        "c_custkey",
        "c_name",
        F.coalesce("first_orderkey", F.lit(-1)).alias("first_orderkey"),
        F.coalesce("first_order_us", F.lit(-1)).alias("first_order_us"),
        F.col("o_custkey").isNotNull().alias("matched"),
    )
