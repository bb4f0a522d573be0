"""§2.D — aggregations (the ClickHouse aggregate surface on Spark).

ClickHouse-analog functions map to built-in JVM-side Spark aggregates —
uniq→approx_count_distinct, argMax→max_by, countIf/sumIf→agg over
CASE WHEN, quantile→percentile/percentile_approx, groupArray→
collect_list, topK→count+rank. No UDFs: every query here is a single
shuffle on its grouping key with map-side partial aggregation, so the
shuffle volume is |groups| × partitions at any scale.

Determinism: double sums/means go through functions.numeric fixed-point
(bit-identical across engines and partitionings); dispersion stats are
derived from exact fixed-point moments with an identical IEEE operation
order on both sides; every ranking has a total-order tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import (
    dmean,
    dsum,
    fixed_point,
    o_dmean,
    o_dsum,
    o_fixed_point,
)
from mysql_to_clickhouse_spark.plans.prefix import running_sums
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
        
    )


# ---------------------------------------------------------------------------
# d2_global_agg — no-group totals
# ---------------------------------------------------------------------------

_D2_ORACLE = f"""
SELECT
  COUNT(*) AS n_rows,
  {o_dsum('l_extendedprice')} AS total_price,
  MIN(l_quantity) AS min_qty,
  MAX(l_quantity) AS max_qty,
  MIN(l_shipdate) AS first_ship,
  MAX(l_shipdate) AS last_ship
FROM lineitem
"""


@register("d2_global_agg", oracle=_D2_ORACLE, tier="T1")
def d2_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row global aggregate (no grouping key → one partial per
    task, one-row final merge; no meaningful shuffle at any scale)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


# ---------------------------------------------------------------------------
# d3_count_distinct — exact NDV per group (CH count(DISTINCT ...))
# ---------------------------------------------------------------------------

_D3_ORACLE = """
SELECT
  date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
  COUNT(DISTINCT user_id) AS uniq_users,
  COUNT(*) AS n_events
FROM events
GROUP BY day
ORDER BY day
"""


@register("d3_count_distinct", oracle=_D3_ORACLE)
def d3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per day (daily active users).

    Scale: count(distinct) expands to a two-phase aggregate
    (dedup-by-(day,user) then count) — Spark plans this automatically;
    the first shuffle carries distinct pairs only. When the session
    routes the events/day_user AGGREGATE PROJECTION
    (tables.ensure_agg_projection — the CH projection contract: the
    (day, user) dedup is paid once at insert time), pick() answers
    from it instead: uniq_users is then a plain COUNT over
    pre-distinct pairs and n_events a SUM of their p_count partials —
    tens of thousands of rows instead of a full event-stream
    re-deduplication per run (the same move that took w1 from 3.08 s
    to 0.75 s at the 1e8 tier). Identical results either way; the
    drive path never routes a projection."""
    from mysql_to_clickhouse_spark.plans.projection import Projection, pick
    from mysql_to_clickhouse_spark.tables import load_agg_projection

    state = load_agg_projection(spark, sf_dir, "events", "day_user")
    candidates = (
        [Projection("events_day_user", ("day", "user_id"), state)]
        if state is not None
        else []
    )
    proj = pick({"day"}, candidates)
    if proj is not None:
        # projection rows ARE the distinct (day, user) pairs
        return proj.state.groupBy("day").agg(
            F.count(F.lit(1)).alias("uniq_users"),
            F.sum("p_count").alias("n_events"),
        )
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("uniq_users"),
            F.count(F.lit(1)).alias("n_events"),
        )

    )


# ---------------------------------------------------------------------------
# d4_approx_distinct — CH uniq()/HLL (approximate → rows-only check;
# tolerance asserted in tests/test_aggregates.py)
# ---------------------------------------------------------------------------


@register(
    "d4_approx_distinct",
    oracle=None,
    no_oracle_reason=(
        "HLL sketch estimate has no exact SQL twin; the rsd error bound "
        "is SQL-hash-checked as booleans in d4b"
    ),
    test="tests/test_approx.py::test_approx_distinct_within_rsd",
)
def d4_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ NDV per event_type (CH `uniq`).

    At 100 TB this is THE way to count distincts: fixed-size sketches
    merge associatively, so the shuffle carries one sketch per group per
    partition instead of every distinct value.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        
    )


_D4B_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_within_5pct,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("d4b_approx_bound", oracle=_D4B_ORACLE)
def d4b_approx_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d4's HLL sketch made SQL-checkable: the Spark side computes BOTH
    the exact NDV and the HLL estimate and surfaces the 5% relative-
    error bound as a boolean; the oracle states exact NDV and literal
    TRUE. A sketch drifting out of tolerance turns the column false and
    the driver's hash check red — the deterministic companion the
    rows-only d4 can't provide (HLL is deterministic for given data, so
    this hashes stably)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("_hll"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_hll") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("hll_within_5pct"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# d5_cond_agg — CH countIf / sumIf / avgIf
# ---------------------------------------------------------------------------

_D5_ORACLE = f"""
SELECT
  l_returnflag,
  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS cnt_discounted,
  {o_dsum('CASE WHEN l_discount > 0.05 THEN l_extendedprice END')} AS sum_if_price,
  {o_dmean('CASE WHEN l_quantity >= 25 THEN l_extendedprice END')} AS avg_if_price,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d5_cond_agg", oracle=_D5_ORACLE)
def d5_cond_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline-filtered aggregates (CH countIf/sumIf/avgIf) via agg over
    CASE WHEN — one pass, no extra scan per condition."""
    li = load(spark, sf_dir, "lineitem")
    discounted = F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
    big_qty = F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias(
                "cnt_discounted"
            ),
            dsum(discounted).alias("sum_if_price"),
            dmean(big_qty).alias("avg_if_price"),
            F.count(F.lit(1)).alias("n"),
        )
        
    )


# ---------------------------------------------------------------------------
# d6_argmax — CH argMax/argMin → max_by/min_by
# ---------------------------------------------------------------------------

# Determinism: bare max_by/min_by ties are arbitrary, so both engines
# order by a composite (c_acctbal, c_name) packed into one
# lexicographically-sortable string — acctbal as offset fixed-point
# cents lpad'd to 7 digits (range −999.99..9999.99 → 0..1099999), then
# the name. Tie-safe at ANY scale factor, not just where extrema happen
# to be unique. (DuckDB's max_by can't order by a STRUCT; the string
# pack is the portable total order.)

_D6_ORACLE = """
SELECT
  n_name,
  max_by(c_name, CONCAT(lpad(CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT)
    + 100000 AS VARCHAR), 7, '0'), '|', c_name)) AS richest_customer,
  MAX(c_acctbal) AS top_acctbal,
  min_by(c_name, CONCAT(lpad(CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT)
    + 100000 AS VARCHAR), 7, '0'), '|', c_name)) AS poorest_customer
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def _acctbal_name_key():
    """(c_acctbal, c_name) as one sortable string: offset fixed-point
    cents, zero-padded so string order == numeric order, then name."""
    cents = (F.round(F.col("c_acctbal") * 100).cast("long") + 100000).cast(
        "string"
    )
    return F.concat(F.lpad(cents, 7, "0"), F.lit("|"), F.col("c_name"))


@register("d6_argmax", oracle=_D6_ORACLE)
def d6_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH argMax/argMin: value of one column at the extremum of another,
    without a self-join (single-pass aggregate, broadcast dim join)."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", _acctbal_name_key()).alias("richest_customer"),
            F.max("c_acctbal").alias("top_acctbal"),
            F.min_by("c_name", _acctbal_name_key()).alias("poorest_customer"),
        )

    )


# ---------------------------------------------------------------------------
# d7_collect — CH groupArray/groupUniqArray (sorted, string-joined for a
# deterministic, engine-portable output shape)
# ---------------------------------------------------------------------------

_D7_ORACLE = """
SELECT
  r_name,
  array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
  COUNT(DISTINCT n_name) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


@register("d7_collect", oracle=_D7_ORACLE)
def d7_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group set collection (CH groupUniqArray). collect_set order is
    nondeterministic → sort_array before surfacing (SURVEY.md §5.4);
    joined to a string so both engines hash the same canonical value."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
            F.countDistinct("n_name").alias("n_nations"),
        )
        
    )


# ---------------------------------------------------------------------------
# d8_quantile — CH quantile/quantiles (exact; approx variant is d8b)
# ---------------------------------------------------------------------------

# l_quantity is integer-valued (verified on testdata) → linear
# interpolation lands on exact .0/.5 doubles, identical on both engines.
_D8_ORACLE = """
SELECT
  l_returnflag,
  quantile_cont(l_quantity, 0.5) AS p50_qty,
  quantile_cont(l_quantity, 0.9) AS p90_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d8_quantile", oracle=_D8_ORACLE)
def d8_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentile per group (CH quantileExact).

    Scale note: exact percentile needs the group's values together
    (sort-based agg); for 100 TB use d8b_quantile_approx — fixed-size
    mergeable sketches, no per-group materialization.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("p50_qty"),
            F.percentile("l_quantity", 0.9).alias("p90_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        
    )


@register(
    "d8b_quantile_approx",
    oracle=None,
    no_oracle_reason=(
        "approx_percentile's KLL-style sketch is implementation-specific; "
        "band vs the exact percentile is asserted instead"
    ),
    test="tests/test_approx.py::test_approx_quantile_within_band",
)
def d8b_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (CH quantileTDigest analog): mergeable
    sketch, the scale path for quantiles. Rows-only check; tolerance
    asserted in unit tests."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_price"),
            F.percentile_approx("l_extendedprice", 0.99, 1000).alias("p99_price"),
        )
        
    )


_D8C_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS exact_p50,
       TRUE AS approx_within_tol,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d8c_quantile_bound", oracle=_D8C_ORACLE)
def d8c_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d8b's sketch made SQL-checkable (companion pattern of d4b): the
    Spark side computes the exact p50 AND the t-digest-style
    percentile_approx and surfaces |approx − exact| ≤ 2.0 as a boolean
    (accuracy 1000 → rank error ≲ n/1000, ≤ one integer quantity step
    on this column); the oracle states the exact value and TRUE."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("exact_p50"),
            F.percentile_approx("l_quantity", 0.5, 1000).alias("_ap50"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            (F.abs(F.col("_ap50") - F.col("exact_p50")) <= 2.0).alias(
                "approx_within_tol"
            ),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# d9_rollup — hierarchy subtotals
# ---------------------------------------------------------------------------

_D9_ORACLE = f"""
SELECT
  r_name,
  n_name,
  CAST(GROUPING(r_name) AS INT) AS g_region,
  CAST(GROUPING(n_name) AS INT) AS g_nation,
  COUNT(*) AS n_customers,
  {o_dsum('c_acctbal')} AS total_acctbal
FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY g_region, g_nation, r_name NULLS FIRST, n_name NULLS FIRST
"""


@register("d9_rollup", oracle=_D9_ORACLE)
def d9_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region→nation→grand-total with grouping() flags.

    Spark plans rollup as Expand (3 rows per input here) + one hash
    aggregate — a single shuffle; fine at scale since Expand is
    map-side."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
        .select(
            "r_name", "n_name", "g_region", "g_nation", "n_customers", "total_acctbal"
        )
        
    )


# ---------------------------------------------------------------------------
# d10_cube_sets — CUBE over two independent dimensions
# ---------------------------------------------------------------------------

_D10_ORACLE = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
  COUNT(*) AS n_orders,
  {o_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register("d10_cube_sets", oracle=_D10_ORACLE, tier="T3")
def d10_cube_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE = all grouping-set combinations (CH GROUPING SETS surface)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
        
    )


# ---------------------------------------------------------------------------
# d11_having — post-aggregation filter
# ---------------------------------------------------------------------------

_D11_ORACLE = f"""
SELECT
  o_custkey,
  COUNT(*) AS n_orders,
  {o_dsum('o_totalprice')} AS spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 15
ORDER BY o_custkey
"""


@register("d11_having", oracle=_D11_ORACLE)
def d11_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = filter over aggregate output (frequent buyers)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("spend"),
        )
        .filter(F.col("n_orders") > 15)
        
    )


# ---------------------------------------------------------------------------
# d12_stats_agg — dispersion + correlation from exact moments
# ---------------------------------------------------------------------------

# Determinism (SURVEY.md §5.4): built-in stddev/corr accumulate doubles in
# partition order → last-ulp divergence vs DuckDB. Instead both sides
# compute exact fixed-point moment sums and then the SAME IEEE formula:
#   var_samp = (sxx - sx*sx/n) / (n-1)
#   corr     = (sxy - sx*sy/n) / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n))
# x=l_quantity (≤50), y=l_extendedprice (≤1.1e5): xx ≤ 2.5e3 @scale4,
# xy ≤ 5.5e6 and yy ≤ 1.3e10 @scale2 → int64-safe past 1e6 rows/group;
# for larger groups drop the moment scale (documented, not needed here).

_D12_MOMENTS_SQL = f"""
  COUNT(*) AS n,
  CAST(SUM({o_fixed_point('l_quantity', 4)}) AS DOUBLE) / 10000.0 AS sx,
  CAST(SUM({o_fixed_point('l_extendedprice', 4)}) AS DOUBLE) / 10000.0 AS sy,
  CAST(SUM({o_fixed_point('l_quantity * l_quantity', 4)}) AS DOUBLE) / 10000.0 AS sxx,
  CAST(SUM({o_fixed_point('l_quantity * l_extendedprice', 2)}) AS DOUBLE) / 100.0 AS sxy,
  CAST(SUM({o_fixed_point('l_extendedprice * l_extendedprice', 2)}) AS DOUBLE) / 100.0 AS syy
"""

_D12_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag, {_D12_MOMENTS_SQL}
  FROM lineitem GROUP BY l_returnflag
)
SELECT
  l_returnflag,
  n,
  sx / n AS mean_qty,
  (sxx - sx * sx / n) / (n - 1) AS var_qty,
  sqrt((sxx - sx * sx / n) / (n - 1)) AS std_qty,
  (sxy - sx * sy / n)
    / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_qty_price
FROM m
ORDER BY l_returnflag
"""


@register("d12_stats_agg", oracle=_D12_ORACLE)
def d12_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/correlation per group from exact moment sums
    (order-independent twin of stddev_samp/var_samp/corr)."""
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(fixed_point(x, 4)).cast("double") / 10000.0).alias("sx"),
        (F.sum(fixed_point(y, 4)).cast("double") / 10000.0).alias("sy"),
        (F.sum(fixed_point(x * x, 4)).cast("double") / 10000.0).alias("sxx"),
        (F.sum(fixed_point(x * y, 2)).cast("double") / 100.0).alias("sxy"),
        (F.sum(fixed_point(y * y, 2)).cast("double") / 100.0).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    var_qty = (sxx - sx * sx / n) / (n - 1)
    return m.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        var_qty.alias("var_qty"),
        F.sqrt(var_qty).alias("std_qty"),
        (
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        ).alias("corr_qty_price"),
    )


# ---------------------------------------------------------------------------
# d13_topk_groups — CH topK: k most frequent values per group
# ---------------------------------------------------------------------------

_D13_ORACLE = """
WITH counted AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type, COUNT(*) AS cnt
  FROM events
  GROUP BY day, event_type
), ranked AS (
  SELECT day, event_type, cnt,
         ROW_NUMBER() OVER (
           PARTITION BY day ORDER BY cnt DESC, event_type
         ) AS rk
  FROM counted
)
SELECT day, event_type, cnt, rk
FROM ranked WHERE rk <= 3
ORDER BY day, rk
"""


@register("d13_topk_groups", oracle=_D13_ORACLE)
def d13_topk_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per day (CH topK shape): count-aggregate, then
    rank within day with an explicit tie-break (cnt DESC, event_type).

    Scale: the window runs over the *aggregated* table (days ×
    event_types), not raw events — the heavy lifting stays in the
    map-side-combinable count."""
    ev = load(spark, sf_dir, "events")
    counted = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("day").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        counted.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        
    )


# ---------------------------------------------------------------------------
# d14_distinct_rows — DISTINCT projection
# ---------------------------------------------------------------------------

_D14_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


@register("d14_distinct_rows", oracle=_D14_ORACLE, tier="T1")
def d14_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = group-by-all-columns; partial dedup runs map-side, so
    the shuffle carries only unique pairs."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# d15_bitwise_agg — CH groupBitAnd/Or/Xor
# ---------------------------------------------------------------------------

_D15_ORACLE = """
SELECT event_type,
       bit_and(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_and,
       bit_or(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_or,
       bit_xor(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_xor,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("d15_bitwise_agg", oracle=_D15_ORACLE)
def d15_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates over the JSON-extracted key (CH groupBitAnd/
    groupBitOr/groupBitXor) — integer-exact and fully commutative, so
    no determinism work is needed."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_and(k).alias("k_and"),
            F.bit_or(k).alias("k_or"),
            F.bit_xor(k).alias("k_xor"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# d16_histogram — equal-width histogram (CH histogram sketch analog)
# ---------------------------------------------------------------------------

_D16_ORACLE = """
SELECT LEAST(CAST(FLOOR(o_totalprice / 30000.0) AS BIGINT), 19) AS bucket,
       COUNT(*) AS n,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi
FROM orders
GROUP BY bucket
ORDER BY bucket
"""


@register("d16_histogram", oracle=_D16_ORACLE)
def d16_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bucket histogram of order totals via FLOOR
    bucketing (deterministic on both engines; DuckDB's raw double→int
    cast would round). Map-side combinable — |buckets| rows shuffle."""
    orders = load(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 30000.0).cast("long"), F.lit(19)
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# d17_pivot — wide-format aggregation (Spark pivot API)
# ---------------------------------------------------------------------------

_D17_ORACLE = """
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
FROM events
GROUP BY day
ORDER BY day
"""

_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


@register("d17_pivot", oracle=_D17_ORACLE)
def d17_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: long→wide event counts per day. The value list is given
    explicitly — at scale an unbounded pivot needs a distinct-values
    pass first; pinning the columns keeps it one aggregate and makes
    the schema static (and oracle-checkable)."""
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot leaves NULL for absent combos; the oracle's COUNT gives 0
    return out.select(
        "day", *[F.coalesce(t, F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# d18_unpivot — wide→long (melt)
# ---------------------------------------------------------------------------

_D18_ORACLE = """
SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
ORDER BY l_orderkey, l_linenumber, metric
"""


@register("d18_unpivot", oracle=_D18_ORACLE)
def d18_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: one row per (row, metric) — the long format every
    metrics store ingests. Spark's unpivot is a map-side Expand (zero
    shuffle), unlike the naive N-scan UNION ALL the oracle states."""
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_discount", "discount")
        .otherwise("tax"),
    )


# ---------------------------------------------------------------------------
# d19_summap — CH sumMap / map aggregation (merge keyed histograms)
# ---------------------------------------------------------------------------

_D19_ORACLE = """
WITH per AS (
  SELECT event_type,
         (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) // 3600000000) % 24
           AS hour_utc,
         COUNT(*) AS n_h
  FROM events
  GROUP BY 1, 2
)
SELECT event_type,
       string_agg(CAST(hour_utc AS VARCHAR) || ':' || CAST(n_h AS VARCHAR),
                  ',' ORDER BY hour_utc) AS hour_map,
       CAST(SUM(n_h) AS BIGINT) AS n_events
FROM per
GROUP BY event_type
ORDER BY event_type
"""


@register("d19_summap", oracle=_D19_ORACLE)
def d19_summap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``sumMap`` / Map-combinator aggregation: per group, a keyed
    histogram (hour-of-day → event count) merged by key. Spark has no
    map-valued native aggregate, so the idiomatic plan is two hash
    aggregates — (group, key) partial counts, then assemble the map —
    which is exactly how CH's -Map combinator merges states. The map is
    surfaced as a canonical sorted "k:v,..." string so the hash check
    covers keys AND values (map column ordering would be engine-defined).

    Hour is derived from epoch MICROS with integer div/mod — no
    calendar functions, so the result is timezone-independent (the
    oracle-parity suite runs under a non-UTC TZ).

    Scale: both aggregates are map-side-combinable hash aggs; the
    second one's cardinality is |groups| × 24, tiny. No window, no
    sort shuffle; the collect_list holds ≤24 entries per group."""
    ev = load(spark, sf_dir, "events")
    hour = F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hour_utc")
    per = (
        ev.select("event_type", hour)
        .groupBy("event_type", "hour_utc")
        .agg(F.count(F.lit(1)).alias("n_h"))
    )
    entry = F.struct(F.col("hour_utc"), F.col("n_h"))
    return per.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(entry)),
                lambda x: F.concat_ws(
                    ":", x.hour_utc.cast("string"), x.n_h.cast("string")
                ),
            ),
            ",",
        ).alias("hour_map"),
        F.sum("n_h").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# d20_array_combinators — CH -Array combinator folds (sumArray/minArray/
# maxArray) over the embedding vectors
# ---------------------------------------------------------------------------

_D20_ORACLE = """
SELECT label,
       CAST(SUM(list_sum(list_transform(embedding,
             x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))))
            AS DOUBLE) / 10000.0 AS sum_all,
       MAX(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))))
           AS max_el,
       MIN(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))))
           AS min_el,
       CAST(SUM(len(embedding)) AS BIGINT) AS n_elements
FROM embeddings
GROUP BY label
ORDER BY label
"""


@register("d20_array_combinators", oracle=_D20_ORACLE)
def d20_array_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH's -Array aggregate combinators (sumArray, maxArray, minArray,
    countArray): fold every element of an array column into the group's
    aggregate. The per-row fold runs inside the scan stage with
    higher-order functions (no explode — a posexplode here would
    inflate the shuffle 64×); the sum folds deterministic fixed-point
    bigints (element order within a row is fixed, the cross-row bigint
    sum is order-free), so the double surfaced at the end is
    bit-identical on both engines."""
    emb = load(spark, sf_dir, "embeddings")
    row_fp = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * F.lit(10000.0)).cast("long"),
    )
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.groupBy("label").agg(
        (F.sum(row_fp).cast("double") / F.lit(10000.0)).alias("sum_all"),
        F.max(F.array_max(as_double)).alias("max_el"),
        F.min(F.array_min(as_double)).alias("min_el"),
        F.sum(F.size("embedding")).cast("long").alias("n_elements"),
    )


# ---------------------------------------------------------------------------
# d21_sum_foreach — CH sumForEach: ELEMENT-WISE vector sum per group
# ---------------------------------------------------------------------------

_D21_DIM = 64  # fixed embedding dim (FIXTURES.md); asserted by i7's tests

_D21_ORACLE = f"""
WITH pos AS (SELECT i FROM range(1, {_D21_DIM + 1}) t(i)),
per AS (
  SELECT label, i,
         CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 10000.0)
                       AS BIGINT)) AS BIGINT) AS s
  FROM embeddings, pos
  GROUP BY label, i
)
SELECT label,
       string_agg(CAST(s AS VARCHAR), ',' ORDER BY i) AS sum_vec_fp
FROM per GROUP BY label
ORDER BY label
"""


@register("d21_sum_foreach", oracle=_D21_ORACLE)
def d21_sum_foreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH sumForEach: element-wise sum of an array column per group —
    the centroid-accumulation primitive (IVF training, k-means, mean
    pooling). One hash aggregate with 64 independent bigint sums (one
    per dimension), each reading its lane via element_at inside the
    scan stage: the shuffle carries 64 longs per group — versus a
    posexplode plan that would shuffle rows×64 exploded tuples. The
    fixed-point lanes are surfaced as a canonical comma-joined string
    (exact integers; array formatting differs between engines)."""
    emb = load(spark, sf_dir, "embeddings")
    lanes = [
        F.sum(
            F.floor(
                F.element_at("embedding", i + 1).cast("double")
                * F.lit(10000.0)
            ).cast("long")
        ).cast("string")
        for i in range(_D21_DIM)
    ]
    return emb.groupBy("label").agg(
        F.concat_ws(",", *lanes).alias("sum_vec_fp")
    )


# ---------------------------------------------------------------------------
# d22_hll_shard_union — Datasketches HLL partial states merged across
# shards (CH uniqState / uniqMerge)
# ---------------------------------------------------------------------------

_D22_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS merge_close_to_direct,
       TRUE AS union_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("d22_hll_shard_union", oracle=_D22_ORACLE)
def d22_hll_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH uniqState/uniqMerge expressed with Spark's Datasketches HLL:
    each shard (user_id % 4 — standing in for a cluster's distributed
    table shards) builds an hll_sketch_agg PARTIAL, and hll_union_agg
    merges the binary sketches into the global NDV. The proof
    obligations ride along as checked booleans: the merged estimate
    must land within 5% of BOTH the exact distinct and the direct
    unsharded sketch. NOTE the contract is accuracy, not bit-equality:
    union of per-shard sketches follows a different sparse→dense
    promotion path than a directly-built sketch, so estimates can
    differ in low digits once registers densify (observed at 1,500
    NDV; identical at 150) — the same property CH documents for
    uniqMerge. At 100 TB the shuffle carries one ~KB sketch per
    (shard, group), never the values."""
    ev = load(spark, sf_dir, "events")
    shards = (
        ev.withColumn("shard", F.col("user_id") % 4)
        .groupBy("event_type", "shard")
        .agg(F.hll_sketch_agg("user_id").alias("state"))
    )
    merged = shards.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("state")).alias("merged_ndv")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_ndv"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("merged_ndv") - F.col("direct_ndv"))
                <= 0.05 * F.col("exact_users")
            ).alias("merge_close_to_direct"),
            (
                F.abs(F.col("merged_ndv") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("union_within_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# d23_higher_moments — CH skewPop / kurtPop from exact moment sums
# ---------------------------------------------------------------------------

# Same determinism design as d12: exact fixed-point power sums, then ONE
# shared arithmetic fragment evaluated on both engines so every IEEE op
# runs in the identical order. x = l_quantity ≤ 50 → x^4 ≤ 6.25e6; at
# scale 4 the x^4 sum stays int64-exact past 1e8 rows/group (documented
# headroom; drop the moment scale for wider domains).
_D23_MOMENTS_SQL = f"""
  COUNT(*) AS n,
  CAST(SUM({o_fixed_point('l_quantity', 4)}) AS DOUBLE) / 10000.0 AS s1,
  CAST(SUM({o_fixed_point('l_quantity * l_quantity', 4)}) AS DOUBLE)
    / 10000.0 AS s2,
  CAST(SUM({o_fixed_point('l_quantity * l_quantity * l_quantity', 4)})
    AS DOUBLE) / 10000.0 AS s3,
  CAST(SUM({o_fixed_point(
    'l_quantity * l_quantity * l_quantity * l_quantity', 4)})
    AS DOUBLE) / 10000.0 AS s4
"""

# shared post-moment arithmetic — text-identical on both engines
_D23_MATH = """
  (s2 / n - (s1 / n) * (s1 / n)) AS m2,
  (s3 / n - 3.0 * (s1 / n) * (s2 / n)
    + 2.0 * (s1 / n) * (s1 / n) * (s1 / n)) AS m3c,
  (s4 / n - 4.0 * (s1 / n) * (s3 / n)
    + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
    - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) AS m4c
"""

_D23_FINAL = """
  m3c / sqrt(m2 * m2 * m2) AS skew_qty,
  m4c / (m2 * m2) AS kurt_qty
"""

_D23_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag, {_D23_MOMENTS_SQL}
  FROM lineitem GROUP BY l_returnflag
), c AS (
  SELECT l_returnflag, n, {_D23_MATH} FROM m
)
SELECT l_returnflag, n, {_D23_FINAL}
FROM c
ORDER BY l_returnflag
"""


@register("d23_higher_moments", oracle=_D23_ORACLE)
def d23_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH skewPop/kurtPop (population skewness and raw kurtosis) from
    exact power sums — the order-independent twin of Spark's built-in
    skewness/kurtosis, whose double accumulation diverges from DuckDB
    in the last ulps. Map-side combinable bigint moments, one shuffle;
    the central-moment and ratio arithmetic is a single shared SQL
    fragment evaluated by BOTH engines, so every IEEE operation runs
    in the same order and the doubles hash identically."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(fixed_point(x, 4)).cast("double") / 10000.0).alias("s1"),
        (F.sum(fixed_point(x * x, 4)).cast("double") / 10000.0).alias("s2"),
        (F.sum(fixed_point(x * x * x, 4)).cast("double") / 10000.0).alias("s3"),
        (F.sum(fixed_point(x * x * x * x, 4)).cast("double") / 10000.0).alias(
            "s4"
        ),
    )
    central = m.selectExpr("l_returnflag", "n", *[
        frag.strip() for frag in _D23_MATH.strip().split(",\n")
    ])
    return central.selectExpr("l_returnflag", "n", *[
        frag.strip() for frag in _D23_FINAL.strip().split(",\n")
    ])


# ---------------------------------------------------------------------------
# d24_uniq_upto — CH uniqUpTo(N): exact distinct count, saturating at N+1
# ---------------------------------------------------------------------------

_D24_ORACLE = """
SELECT event_type,
       LEAST(COUNT(DISTINCT user_id), 11) AS uniq_upto_10,
       COUNT(DISTINCT user_id) <= 10 AS is_exact
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("d24_uniq_upto", oracle=_D24_ORACLE)
def d24_uniq_upto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``uniqUpTo(10)(user_id)``: exact distinct count while it is
    <= 10, saturating at 11 ("more than 10") beyond — the bounded-state
    cardinality probe used for "has this key more than N distinct
    values" gates without a full distinct count.

    Scale shape: the plan is distinct-then-count — one exchange on
    (event_type, user_id) that map-side combines to unique pairs, then
    a per-group count capped with LEAST. Spark's partial-distinct
    aggregate means per-reducer state is the group's unique set only
    once, never duplicated rows; the saturation cap is applied to the
    exact result, which CH's bounded uniqUpTo state also guarantees for
    counts <= N (above N both report N+1, so semantics align exactly)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("_d"))
        .select(
            "event_type",
            F.least(F.col("_d"), F.lit(11)).alias("uniq_upto_10"),
            (F.col("_d") <= 10).alias("is_exact"),
        )
    )


# ---------------------------------------------------------------------------
# d25_delta_sum — CH deltaSum: sum of positive consecutive deltas
# ---------------------------------------------------------------------------

_D25_ORACLE = f"""
WITH d AS (
  SELECT user_id,
         value - LAG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events
)
SELECT user_id,
       {o_dsum('delta')} AS delta_sum,
       COUNT(delta) AS n_deltas
FROM d
WHERE delta > 0.0
GROUP BY user_id
ORDER BY user_id
"""


@register("d25_delta_sum", oracle=_D25_ORACLE)
def d25_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``deltaSum(value)`` per user over the ts-ordered event stream:
    the sum of positive increments between consecutive readings — the
    counter-reset-tolerant rate primitive (a monotone counter that
    resets to 0 contributes only its climbs, not the reset cliff).

    One window shuffle on user_id (ordered by ts, event_id tie-break)
    computes each IEEE subtraction on identical operand pairs in both
    engines; the positive deltas then fold through the fixed-point sum,
    so partition order cannot perturb the total. State per key is one
    row (the lag), which is exactly CH's deltaSum state — this scales
    as any single window pass does."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = (F.col("value") - F.lag("value").over(w)).alias("delta")
    return (
        ev.select("user_id", delta)
        .filter(F.col("delta") > 0.0)
        .groupBy("user_id")
        .agg(
            dsum("delta").alias("delta_sum"),
            F.count("delta").alias("n_deltas"),
        )
    )


# ---------------------------------------------------------------------------
# d8d_weighted_quantile — CH quantileExactWeighted (weighted median)
# ---------------------------------------------------------------------------

_D8D_ORACLE = """
WITH wv AS (
  SELECT l_returnflag, l_quantity,
         CAST(SUM(l_linenumber) AS BIGINT) AS w
  FROM lineitem
  GROUP BY l_returnflag, l_quantity
), cum AS (
  SELECT l_returnflag, l_quantity,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM wv
)
SELECT l_returnflag,
       MIN(l_quantity) AS wmedian_qty
FROM cum
WHERE 2 * cw >= tw
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d8d_weighted_quantile", oracle=_D8D_ORACLE)
def d8d_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``quantileExactWeighted(0.5)(l_quantity, l_linenumber)``: the
    weighted median — smallest value whose cumulative weight reaches
    half the group's total. Weights stay integral bigints end-to-end,
    so the 2*cw >= tw comparison is exact on both engines (no float
    rank arithmetic to diverge).

    Scale shape mirrors CH's own state (a value→weight hash map): first
    collapse the fact table to unique (group, value) rows with summed
    weights — the map-side-combinable exchange that bounds downstream
    state by the value cardinality, not the row count — then one window
    pass over that collapsed relation picks the crossing value. For
    l_quantity there are ~50 distinct values per group, so the window
    input is trivial regardless of fact size."""
    li = load(spark, sf_dir, "lineitem")
    wv = li.groupBy("l_returnflag", "l_quantity").agg(
        F.sum("l_linenumber").cast("bigint").alias("w")
    )
    wspec = Window.partitionBy("l_returnflag")
    cum = wv.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(wspec.orderBy("l_quantity")).alias("cw"),
        F.sum("w").over(wspec).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("wmedian_qty"))
    )


# ---------------------------------------------------------------------------
# d27_max_intersections — CH maxIntersections: peak interval overlap
# ---------------------------------------------------------------------------

_D27_ORACLE = """
WITH iv AS (
  SELECT user_id, ts AS t_start,
         ts + INTERVAL 1 HOUR AS t_end
  FROM events
  WHERE event_type = 'view'
), pts AS (
  SELECT user_id, t_start AS t, 1 AS d FROM iv
  UNION ALL
  SELECT user_id, t_end AS t, -1 AS d FROM iv
), sweep AS (
  SELECT user_id,
         SUM(d) OVER (PARTITION BY user_id ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS depth
  FROM pts
)
SELECT user_id, CAST(MAX(depth) AS BIGINT) AS max_concurrent
FROM sweep
GROUP BY user_id
ORDER BY user_id
"""


@register("d27_max_intersections", oracle=_D27_ORACLE)
def d27_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``maxIntersections(start, end)``: the maximum number of
    simultaneously open intervals per user — here each 'view' event
    opens a 1-hour presence interval, and the answer is peak
    concurrency. Classic sweep-line as pure relational ops: every
    interval contributes a +1 point at start and a -1 at end, a
    per-user ordered running sum is the open-interval depth, and the
    max depth is the answer.

    Ends sort before starts at the same instant (d = -1 < +1) —
    touching intervals [a,b),[b,c) therefore do NOT count as
    overlapping, matching CH's half-open convention. One union of two
    projections of the same scan (no second read: both branches prune
    to ts only), one window exchange on user_id, one tiny max — the
    sweep state is a single counter, so a 100 TB events table costs
    exactly one 2x-row shuffle."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("t_start"))
        .withColumn("t_end", F.col("t_start") + F.expr("INTERVAL 1 HOUR"))
    )
    pts = ev.select(
        "user_id", F.col("t_start").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        ev.select("user_id", F.col("t_end").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.select("user_id", F.sum("d").over(w).alias("depth"))
        .groupBy("user_id")
        .agg(F.max("depth").cast("bigint").alias("max_concurrent"))
    )


# ---------------------------------------------------------------------------
# d26_moving_sum_array — CH groupArrayMovingSum (per-key running-sum array)
# ---------------------------------------------------------------------------

_D26_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_id,
         SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
  WHERE event_type = 'purchase'
)
SELECT user_id,
       array_to_string(list(cum ORDER BY ts, event_id), ',') AS moving_sum,
       COUNT(*) AS n_points
FROM c
GROUP BY user_id
ORDER BY user_id
"""


@register("d26_moving_sum_array", oracle=_D26_ORACLE)
def d26_moving_sum_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``groupArrayMovingSum(value)`` per user over ts order: the
    whole prefix-sum trajectory as one array per key (the sparkline /
    cumulative-spend primitive). Sums run in exact fixed-point bigints
    (order-proof); the array is canonicalized by (ts, event_id) sort
    and string-joined for an engine-portable hash, like d7.

    One window exchange on user_id computes the running sum, then the
    per-key collect rides the SAME partitioning — Catalyst plans
    groupBy(user_id) after a user_id window without a second exchange.
    Per-key state is the collected array itself — inherent to the
    operator's return type (CH pays the same); keys here are users,
    whose per-key event counts are bounded by app behavior, not table
    scale."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(fixed_point("value")).over(w).alias("cum"),
    )
    traj = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "cum"))),
            lambda s: s["cum"].cast("string"),
        ),
        ",",
    )
    return (
        cum.groupBy("user_id")
        .agg(traj.alias("moving_sum"), F.count(F.lit(1)).alias("n_points"))
    )


# ---------------------------------------------------------------------------
# d28_bounding_ratio — CH boundingRatio: (last y - first y) / x span
# ---------------------------------------------------------------------------

_D28_ORACLE = """
WITH o AS (
  SELECT user_id,
         FIRST_VALUE(value) OVER w AS v_first,
         LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS v_last,
         MIN(epoch_us(CAST(ts AS TIMESTAMP))) OVER w2 AS t_min,
         MAX(epoch_us(CAST(ts AS TIMESTAMP))) OVER w2 AS t_max
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
         w2 AS (PARTITION BY user_id)
)
SELECT DISTINCT user_id,
       (v_last - v_first) / (CAST(t_max - t_min AS DOUBLE) / 3600000000.0)
         AS rate_per_hour
FROM o
WHERE t_max > t_min
ORDER BY user_id
"""


@register("d28_bounding_ratio", oracle=_D28_ORACLE)
def d28_bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``boundingRatio(ts, value)``: the slope between a series'
    first and last points — net change per hour per user. first/last
    are taken under the total (ts, event_id) order so ties cannot make
    the endpoints ambiguous; the single-row-per-user ratio is one IEEE
    subtraction + division in a stated order on both engines.
    Single-point users (zero time span) are excluded, as CH's NaN
    would be. One window exchange on user_id, then DISTINCT over
    already-partitioned rows — no second fact shuffle."""
    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wp = Window.partitionBy("user_id")
    t_us = F.unix_micros("ts")
    o = ev.select(
        "user_id",
        F.first("value").over(wo).alias("v_first"),
        F.last("value").over(wall).alias("v_last"),
        F.min(t_us).over(wp).alias("t_min"),
        F.max(t_us).over(wp).alias("t_max"),
    )
    return (
        o.filter(F.col("t_max") > F.col("t_min"))
        .select(
            "user_id",
            (
                (F.col("v_last") - F.col("v_first"))
                / ((F.col("t_max") - F.col("t_min")).cast("double") / 3600000000.0)
            ).alias("rate_per_hour"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# d29_interval_length_sum — CH intervalLengthSum: union coverage length
# ---------------------------------------------------------------------------

_D29_ORACLE = """
WITH iv AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS e
  FROM events
  WHERE event_type = 'view'
), pts AS (
  SELECT user_id, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT user_id, e AS t, -1 AS d FROM iv
), sweep AS (
  SELECT user_id, t,
         SUM(d) OVER (PARTITION BY user_id ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS depth,
         LEAD(t) OVER (PARTITION BY user_id ORDER BY t, d) AS nt
  FROM pts
)
SELECT user_id,
       CAST(SUM(CASE WHEN depth > 0 THEN nt - t END) AS BIGINT) AS covered_us
FROM sweep
GROUP BY user_id
ORDER BY user_id
"""


@register("d29_interval_length_sum", oracle=_D29_ORACLE)
def d29_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``intervalLengthSum(start, end)``: total time covered by the
    UNION of each user's 1-hour presence intervals — overlaps counted
    once (d27's sweep-line, integrated instead of maxed). Between
    consecutive boundary points the open-interval depth is constant, so
    coverage = Σ segment lengths where depth > 0. All arithmetic is
    integral µs — exact on both engines; tied boundary points
    contribute zero-length segments, so their engine-arbitrary relative
    order cannot change the sum. Costs one 2×-row window exchange on
    user_id, like d27."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id", F.unix_micros("ts").alias("s"))
        .withColumn("e", F.col("s") + F.lit(3600000000))
    )
    pts = ev.select(
        "user_id", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(ev.select("user_id", F.col("e").alias("t"), F.lit(-1).alias("d")))
    wo = Window.partitionBy("user_id").orderBy("t", "d")
    sweep = pts.select(
        "user_id",
        "t",
        F.sum("d")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("depth"),
        F.lead("t").over(wo).alias("nt"),
    )
    return (
        sweep.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("depth") > 0, F.col("nt") - F.col("t")))
            .cast("bigint")
            .alias("covered_us")
        )
    )


# ---------------------------------------------------------------------------
# d30_lttb_downsample — CH largestTriangleThreeBuckets (per-series LTTB)
# ---------------------------------------------------------------------------

_LTTB_N_OUT = 10


def lttb_reference(ts_us, values, n_out: int):
    """Pure-Python LTTB (Steinarsson 2013, public thesis algorithm) on
    the PORTABLE integer grid: keep the first and last points; for
    each interior bucket pick the point forming the largest triangle
    with the previously selected point and the NEXT bucket's centroid.
    Triangle areas are EXACT integers — x is series-relative whole
    seconds, y is floor(value·1e4), and the centroid fractions are
    cleared by multiplying through the bucket count — so argmax ties
    (earliest point wins) resolve identically on every engine/libm.
    Bucket bounds use exact integer division, not float linspace.
    This grid is what let r11 give d30 a DuckDB recursive-CTE oracle
    and retire its rows-only ledger entry. Shared by the operator's
    per-key kernel and the differential test."""
    import math

    n = len(ts_us)
    if n <= n_out:
        return list(range(n))
    t0 = int(ts_us[0])
    xs = [(int(t) - t0) // 1_000_000 for t in ts_us]
    ys = [math.floor(float(v) * 10000) for v in values]
    bounds = [1 + (k * (n - 2)) // (n_out - 2) for k in range(n_out - 1)]
    idx = [0]
    for b in range(n_out - 2):
        lo, hi = bounds[b], bounds[b + 1]
        nlo = bounds[b + 1]
        nhi = bounds[b + 2] if b + 2 < len(bounds) else n
        c = nhi - nlo
        sx = sum(xs[nlo:nhi])
        sy = sum(ys[nlo:nhi])
        ax, ay = xs[idx[-1]], ys[idx[-1]]
        best, best_a = lo, -1
        for i in range(lo, hi):
            # |(ax·c − Σx)·(y−ay) − (ax−x)·(Σy − ay·c)| — the triangle
            # area ×2c, python ints so arbitrary precision (no silent
            # int64 overflow on long series)
            a2 = abs(
                (ax * c - sx) * (ys[i] - ay) - (ax - xs[i]) * (sy - ay * c)
            )
            if a2 > best_a:
                best, best_a = i, a2
        idx.append(best)
    idx.append(n - 1)
    return idx


_D30_ORACLE = """
WITH RECURSIVE base AS (
  SELECT user_id, event_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         ROW_NUMBER() OVER (PARTITION BY user_id
             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) - 1 AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         MIN(epoch_us(CAST(ts AS TIMESTAMP)))
             OVER (PARTITION BY user_id) AS t0
  FROM events
), pts AS (
  SELECT user_id, i, n, t_us, value,
         CAST((t_us - t0) // 1000000 AS BIGINT) AS x,
         CAST(FLOOR(value * 10000) AS BIGINT) AS y
  FROM base
), cent AS (
  SELECT p.user_id, g.b,
         COUNT(*) AS c, SUM(p.x) AS sx, SUM(p.y) AS sy
  FROM pts p
  JOIN generate_series(0, 7) AS g(b)
    ON p.i >= 1 + ((g.b + 1) * (p.n - 2)) // 8
   AND p.i < CASE WHEN g.b + 2 < 9
                  THEN 1 + ((g.b + 2) * (p.n - 2)) // 8
                  ELSE p.n END
  WHERE p.n > 10
  GROUP BY p.user_id, g.b
), sel AS (
  SELECT user_id, n, 0 AS b, CAST(0 AS BIGINT) AS sel_i, x AS ax, y AS ay
  FROM pts WHERE n > 10 AND i = 0
  UNION ALL
  SELECT s.user_id, s.n, s.b + 1, pick.i, pick.x, pick.y
  FROM sel s
  JOIN cent c ON c.user_id = s.user_id AND c.b = s.b,
  LATERAL (
    SELECT p.i, p.x, p.y
    FROM pts p
    WHERE p.user_id = s.user_id
      AND p.i >= 1 + (s.b * (s.n - 2)) // 8
      AND p.i <  1 + ((s.b + 1) * (s.n - 2)) // 8
    ORDER BY abs(
        (CAST(s.ax AS HUGEINT) * c.c - c.sx) * (p.y - s.ay)
        - CAST(s.ax - p.x AS HUGEINT)
          * (c.sy - CAST(s.ay AS HUGEINT) * c.c)
      ) DESC, p.i ASC
    LIMIT 1
  ) pick
  WHERE s.b < 8
)
SELECT s.user_id, CAST(s.b AS INT) AS point_rank, p.t_us AS ts_us, p.value
FROM sel s JOIN pts p ON p.user_id = s.user_id AND p.i = s.sel_i
UNION ALL
SELECT user_id, 9 AS point_rank, t_us AS ts_us, value
FROM pts WHERE n > 10 AND i = n - 1
UNION ALL
SELECT user_id, CAST(i AS INT) AS point_rank, t_us AS ts_us, value
FROM pts WHERE n <= 10
ORDER BY user_id, point_rank
"""


@register("d30_lttb_downsample", oracle=_D30_ORACLE, tier="T3")
def d30_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``largestTriangleThreeBuckets(10)(ts, value)``: downsample
    each user's value series to 10 visually-representative points (the
    standard charting decimator). LTTB is inherently sequential within
    one series (each pick depends on the previous pick), so the right
    Spark shape is applyInPandas: one Arrow-batched Python call per
    user group running the exact-integer kernel — parallel across the
    millions of series, sequential only inside each (which CH's
    implementation also is).

    Hash-portable since r11 (ledger entry retired): the selection grid
    is exact-integer (relative seconds × fixed-point-1e4 values,
    centroid fractions cleared by the bucket count, integer bucket
    bounds), so argmax ties are deterministic on every engine and the
    DuckDB oracle — LTTB as a recursive CTE carrying (prev point) state
    with a LATERAL argmax per bucket — matches value-for-value. The
    kernel's python ints are arbitrary-precision; the oracle's HUGEINT
    casts serve the same no-silent-overflow contract."""
    import pandas as pd

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value", "event_id"
    )

    def downsample(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        keep = lttb_reference(
            pdf["ts_us"].tolist(), pdf["value"].tolist(), _LTTB_N_OUT
        )
        out = pdf.iloc[keep][["user_id", "ts_us", "value"]].copy()
        out["point_rank"] = range(len(keep))
        return out

    return ev.groupBy("user_id").applyInPandas(
        downsample, "user_id long, ts_us long, value double, point_rank int"
    )


# ---------------------------------------------------------------------------
# d31_welch_ttest — CH welchTTest: two-sample unequal-variance t statistic
# ---------------------------------------------------------------------------

# Exact fixed-point power sums per sample (d23's determinism design),
# then ONE shared arithmetic fragment for mean/variance/t — every IEEE
# op in identical order on both engines. sqrt is IEEE-754
# correctly-rounded, so it is hash-safe (unlike log — see d23 notes).
_D31_SUMS_SQL = """
  COUNT(*) AS n,
  CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS s1,
  CAST(SUM(CAST(FLOOR(value * value * 10000.0) AS BIGINT)) AS DOUBLE)
    / 10000.0 AS s2
"""

_D31_MATH = """
  (a_s1 / a_n) AS mean_a,
  (b_s1 / b_n) AS mean_b,
  ((a_s2 - (a_s1 / a_n) * a_s1) / (a_n - 1)) AS var_a,
  ((b_s2 - (b_s1 / b_n) * b_s1) / (b_n - 1)) AS var_b
"""

_D31_FINAL = """
  (mean_a - mean_b)
    / sqrt(var_a / a_n + var_b / b_n) AS t_stat,
  (var_a / a_n + var_b / b_n) * (var_a / a_n + var_b / b_n)
    / ((var_a / a_n) * (var_a / a_n) / (a_n - 1)
       + (var_b / b_n) * (var_b / b_n) / (b_n - 1)) AS welch_df
"""

_D31_ORACLE = f"""
WITH a AS (
  SELECT {_D31_SUMS_SQL} FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT {_D31_SUMS_SQL} FROM events WHERE event_type = 'click'
), s AS (
  SELECT a.n AS a_n, a.s1 AS a_s1, a.s2 AS a_s2,
         b.n AS b_n, b.s1 AS b_s1, b.s2 AS b_s2
  FROM a CROSS JOIN b
), m AS (
  SELECT a_n, b_n, {_D31_MATH} FROM s
)
SELECT a_n, b_n, mean_a, mean_b, {_D31_FINAL}
FROM m
"""


@register("d31_welch_ttest", oracle=_D31_ORACLE)
def d31_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``welchTTest(value, group)``: does the purchase population's
    value differ from the click population's — the unequal-variance
    two-sample t statistic plus Welch–Satterthwaite degrees of freedom.

    Both samples reduce to (n, Σx, Σx²) in exact fixed-point — ONE scan
    of the fact table producing two conditional partial aggregates, no
    shuffle beyond the single-row merge — and the entire statistic is
    post-aggregate arithmetic on six scalars, stated once and evaluated
    in the same order by both engines. The same shape holds at 100 TB:
    a t-test is a fold, not a join."""
    ev = load(spark, sf_dir, "events")

    def sums(tag: str, etype: str):
        cond = F.col("event_type") == etype
        v = F.when(cond, F.col("value"))
        return [
            F.count(v).alias(f"{tag}_n"),
            (F.sum(fixed_point(v)).cast("double") / 10000.0).alias(f"{tag}_s1"),
            (
                F.sum(fixed_point(v * F.col("value"))).cast("double") / 10000.0
            ).alias(f"{tag}_s2"),
        ]

    s = ev.agg(*sums("a", "purchase"), *sums("b", "click"))
    m = s.selectExpr(
        "a_n", "b_n", *[frag.strip() for frag in _D31_MATH.strip().split(",\n")]
    )
    return m.selectExpr(
        "a_n", "b_n", "mean_a", "mean_b",
        *[frag.strip() for frag in _D31_FINAL.strip().split(",\n")],
    )


# ---------------------------------------------------------------------------
# d32_mann_whitney — CH mannWhitneyUTest: rank-sum U, exactly, in integers
# ---------------------------------------------------------------------------

# U_A = Σ_pairs [a > b] + ½[a == b]. Doubling clears the half-ties:
# 2U_A = Σ_v n_a(v)·(2·cum_b(<v) + n_b(v)) — all-integer, so both
# engines agree bit-for-bit with no rank-average float arithmetic.
_D32_ORACLE = """
WITH vc AS (
  SELECT value,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_a,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_b
  FROM events
  WHERE event_type IN ('purchase', 'click')
  GROUP BY value
), c AS (
  SELECT n_a, n_b,
         COALESCE(SUM(n_b) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_b
  FROM vc
)
SELECT CAST(SUM(n_a * (2 * cum_b + n_b)) AS BIGINT) AS u2_a,
       CAST(SUM(n_a) AS BIGINT) AS n_a,
       CAST(SUM(n_b) AS BIGINT) AS n_b,
       CAST(SUM(n_a) * SUM(n_b) AS BIGINT) AS u2_max_half
FROM c
"""


@register("d32_mann_whitney", oracle=_D32_ORACLE)
def d32_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``mannWhitneyUTest(value, group)``: the rank-sum U statistic
    for purchase-vs-click values, computed EXACTLY — 2·U stays in
    bigints (ties contribute their half through the doubling), so there
    is no average-rank float path to diverge between engines.
    u2_a / (2·n_a·n_b) is the rank-biserial effect size when a
    consumer wants it.

    Scale shape: the fact table collapses to per-distinct-value
    (n_a, n_b) counts first (one map-side-combinable exchange — the
    d8d idiom), and the ordered cumulative walks DISTINCT VALUES, not
    rows — via the two-phase parallel prefix sum (plans/prefix.py), so
    even an unbounded value domain never funnels into one partition:
    the sort is range-partitioned and only 32 offset rows touch the
    driver."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    vc = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_a"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_b"),
    )
    incl, _ = running_sums(vc, ["value"], {"cum_b_incl": F.col("n_b")})
    c = incl.select(
        "n_a",
        "n_b",
        (F.col("cum_b_incl") - F.col("n_b")).alias("cum_b"),  # exclusive
    )
    return c.agg(
        F.sum(F.col("n_a") * (2 * F.col("cum_b") + F.col("n_b")))
        .cast("bigint")
        .alias("u2_a"),
        F.sum("n_a").cast("bigint").alias("n_a"),
        F.sum("n_b").cast("bigint").alias("n_b"),
        (F.sum("n_a") * F.sum("n_b")).cast("bigint").alias("u2_max_half"),
    )


# ---------------------------------------------------------------------------
# d33_journey_concat — ordered groupConcat: the per-user event-path string
# ---------------------------------------------------------------------------

_D33_ORACLE = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS journey,
       COUNT(*) AS n_steps
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("d33_journey_concat", oracle=_D33_ORACLE)
def d33_journey_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chronologically ORDERED string aggregation (CH groupConcat with
    ORDER BY / MySQL GROUP_CONCAT): each user's full event-type path as
    one 'view>click>purchase>...' string — the journey-analysis input
    h10/h15's pattern matchers scan. Spark has no ordered string_agg,
    so the canonical form is collect structs → array_sort (total
    (ts, event_id) order makes ties deterministic) → transform →
    array_join, all inside ONE aggregate — no window pass, one shuffle
    on user_id, per-key state exactly the output string (same as any
    engine's ordered concat)."""
    ev = load(spark, sf_dir, "events")
    journey = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("t"),
                        "event_id",
                        "event_type",
                    )
                )
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    return ev.groupBy("user_id").agg(
        journey.alias("journey"), F.count(F.lit(1)).alias("n_steps")
    )


# ---------------------------------------------------------------------------
# d34_minmax_map — CH minMap/maxMap: keyed element-wise min/max merge
# ---------------------------------------------------------------------------

_D34_ORACLE = """
WITH per AS (
  SELECT event_type,
         (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) // 3600000000) % 24
           AS hour_utc,
         CAST(MIN(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT) AS v_min,
         CAST(MAX(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT) AS v_max
  FROM events
  GROUP BY 1, 2
)
SELECT event_type,
       string_agg(CAST(hour_utc AS VARCHAR) || ':' || CAST(v_min AS VARCHAR),
                  ',' ORDER BY hour_utc) AS min_map,
       string_agg(CAST(hour_utc AS VARCHAR) || ':' || CAST(v_max AS VARCHAR),
                  ',' ORDER BY hour_utc) AS max_map
FROM per
GROUP BY event_type
ORDER BY event_type
"""


@register("d34_minmax_map", oracle=_D34_ORACLE)
def d34_minmax_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``minMap``/``maxMap``: d19's -Map combinator with min/max
    merge instead of sum — per (group, hour) extrema assembled into
    canonical sorted "k:v" strings (values fixed-pointed so the
    extremum comparison is integral on both engines). Same two
    map-side-combinable hash aggregates, same tiny second-stage
    cardinality, no window."""
    ev = load(spark, sf_dir, "events")
    hour = F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hour_utc")
    per = (
        ev.select("event_type", hour, fixed_point("value").alias("v_fp"))
        .groupBy("event_type", "hour_utc")
        .agg(
            F.min("v_fp").cast("bigint").alias("v_min"),
            F.max("v_fp").cast("bigint").alias("v_max"),
        )
    )

    def kv_map(val_col: str):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("hour_utc", val_col))
                ),
                lambda s: F.concat_ws(
                    ":",
                    s["hour_utc"].cast("string"),
                    s[val_col].cast("string"),
                ),
            ),
            ",",
        )

    return per.groupBy("event_type").agg(
        kv_map("v_min").alias("min_map"),
        kv_map("v_max").alias("max_map"),
    )


# ---------------------------------------------------------------------------
# d58_quantiles_multi — CH quantiles(...)(x): the multi-level combinator
# ---------------------------------------------------------------------------

# One sort-based aggregate evaluates EVERY level (CH's quantiles()
# plural vs N separate quantile() calls); levels surface as columns so
# the hash check is dtype-portable. Interpolation parity with DuckDB's
# quantile_cont is the established d8 discipline.
_D58_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.50) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       quantile_cont(l_quantity, 0.90) AS p90,
       quantile_cont(l_quantity, 0.99) AS p99,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d58_quantiles_multi", oracle=_D58_ORACLE, tier="T3")
def d58_quantiles_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``quantiles(0.25, ..., 0.99)(x)`` — the plural combinator:
    ALL levels from ONE sort-based aggregate (Spark's array-fraction
    ``percentile`` sorts the group once; five scalar calls would sort
    five times). Levels unpack into columns.

    Scale note: same caveat as d8 — exact quantiles materialize each
    group; the sketch path (d8b) is the 100 TB default, this is the
    small-group exact tool."""
    li = load(spark, sf_dir, "lineitem")
    qs = F.percentile(
        "l_quantity", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.9, 0.99)])
    )
    agg = li.groupBy("l_returnflag").agg(
        qs.alias("q"), F.count(F.lit(1)).cast("long").alias("n")
    )
    return agg.select(
        "l_returnflag",
        F.col("q")[0].alias("p25"),
        F.col("q")[1].alias("p50"),
        F.col("q")[2].alias("p75"),
        F.col("q")[3].alias("p90"),
        F.col("q")[4].alias("p99"),
        "n",
    )


# ---------------------------------------------------------------------------
# d59_student_ttest — CH studentTTest: pooled-variance two-sample t
# ---------------------------------------------------------------------------

# Same six scalars as d31 (n, Σx, Σx² per sample, exact fixed point);
# only the final arithmetic differs: pooled variance and n_a+n_b-2
# degrees of freedom. Fragments shared verbatim between engines.
# Empty-sample / zero-dof guards (the d56 discipline): the statistic
# is NULL, never an ANSI divide-by-zero vs IEEE-NaN divergence.
_D59_MATH = """
  CASE WHEN a_n = 0 THEN NULL ELSE a_s1 / a_n END AS mean_a,
  CASE WHEN b_n = 0 THEN NULL ELSE b_s1 / b_n END AS mean_b,
  CASE WHEN a_n = 0 OR b_n = 0 OR a_n + b_n <= 2 THEN NULL
       ELSE ((a_s2 - (a_s1 / a_n) * a_s1) + (b_s2 - (b_s1 / b_n) * b_s1))
            / (a_n + b_n - 2) END AS pooled_var
"""

_D59_FINAL = """
  CASE WHEN pooled_var IS NULL OR pooled_var <= 0.0 THEN NULL
       ELSE (mean_a - mean_b)
            / sqrt(pooled_var * (1.0 / CAST(a_n AS DOUBLE)
                                 + 1.0 / CAST(b_n AS DOUBLE))) END AS t_stat,
  (a_n + b_n - 2) AS df
"""

_D59_ORACLE = f"""
WITH a AS (
  SELECT {_D31_SUMS_SQL} FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT {_D31_SUMS_SQL} FROM events WHERE event_type = 'click'
), s AS (
  SELECT a.n AS a_n, a.s1 AS a_s1, a.s2 AS a_s2,
         b.n AS b_n, b.s1 AS b_s1, b.s2 AS b_s2
  FROM a CROSS JOIN b
), m AS (
  SELECT a_n, b_n, {_D59_MATH} FROM s
)
SELECT a_n, b_n, mean_a, mean_b, pooled_var, {_D59_FINAL}
FROM m
"""


@register("d59_student_ttest", oracle=_D59_ORACLE, tier="T3")
def d59_student_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``studentTTest(value, group)``: the equal-variance companion
    to d31's Welch test — pooled variance, n_a+n_b−2 degrees of
    freedom. Same one-scan two-conditional-partials shape; the entire
    statistic is post-aggregate scalar arithmetic stated once and
    evaluated in identical order by both engines.

    Scale: a fold — one fact scan, a single-row merge, no joins."""
    ev = load(spark, sf_dir, "events")

    def sums(tag: str, etype: str):
        cond = F.col("event_type") == etype
        v = F.when(cond, F.col("value"))
        return [
            F.count(v).alias(f"{tag}_n"),
            (F.sum(fixed_point(v)).cast("double") / 10000.0).alias(f"{tag}_s1"),
            (
                F.sum(fixed_point(v * F.col("value"))).cast("double") / 10000.0
            ).alias(f"{tag}_s2"),
        ]

    s = ev.agg(*sums("a", "purchase"), *sums("b", "click"))
    m = s.selectExpr(
        "a_n", "b_n", *[frag.strip() for frag in _D59_MATH.strip().split(",\n")]
    )
    return m.selectExpr(
        "a_n", "b_n", "mean_a", "mean_b", "pooled_var",
        *[frag.strip() for frag in _D59_FINAL.strip().split(",\n")],
    )


# ---------------------------------------------------------------------------
# d60_group_array_sorted — CH groupArraySorted(k): smallest-k as array
# ---------------------------------------------------------------------------

# The array is string-joined (d7's portability discipline: list dtypes
# hash differently across engines; a joined string is dtype-stable).
_D60_K = 5

_D60_ORACLE = f"""
SELECT l_returnflag,
       array_to_string(list_sort(list(l_quantity))[1:{_D60_K}], ',')
         AS smallest_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d60_group_array_sorted", oracle=_D60_ORACLE, tier="T3")
def d60_group_array_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``groupArraySorted(k)(x)``: the k smallest values per group,
    as an ordered array (string-joined for hash portability, the d7
    discipline). CH keeps a bounded heap per group; Spark's
    collect+sort+slice is semantically identical — for large groups at
    100 TB prefer the d13 window form (partial WindowGroupLimit prunes
    map-side) over materializing each group's full list.

    Scale note: collect_list carries the whole group through the
    aggregate; acceptable for bounded groups (the CH function is
    documented for small k over modest groups), and the plan stays one
    hash aggregate."""
    li = load(spark, sf_dir, "lineitem")
    arr = F.slice(F.sort_array(F.collect_list("l_quantity")), 1, _D60_K)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.array_join(arr, ",").alias("smallest_qty"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# d62_with_totals — CH GROUP BY ... WITH TOTALS (incl. HAVING interaction)
# ---------------------------------------------------------------------------

# ClickHouse's WITH TOTALS appends one extra row holding the aggregate
# over ALL source rows. Under the default totals_mode=before_having the
# totals row ignores HAVING (it covers groups HAVING filtered out) —
# exactly what this operator pins: the HAVING keeps only above-average
# groups, the totals row still covers everything. Integer-only HAVING
# predicate (n * n_groups > tot_n) so both engines compare exactly.
_D62_ORACLE = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT)
           AS value_fp
  FROM events GROUP BY event_type
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
         CAST(SUM(value_fp) AS BIGINT) AS tot_fp,
         CAST(COUNT(*) AS BIGINT) AS n_groups
  FROM g
)
SELECT g.event_type, g.n, g.value_fp, 'group' AS row_kind
FROM g, t WHERE g.n * t.n_groups > t.tot_n
UNION ALL
SELECT CAST(NULL AS VARCHAR) AS event_type, tot_n AS n, tot_fp AS value_fp,
       'totals' AS row_kind
FROM t
ORDER BY row_kind, event_type
"""


@register("d62_with_totals", oracle=_D62_ORACLE, tier="T3")
def d62_with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``GROUP BY ... WITH TOTALS``: the per-group rows plus ONE
    extra row aggregating every source row, here with a HAVING (keep
    above-average groups) to pin the default totals_mode=before_having
    semantics — the totals row is computed over ALL groups, including
    the ones HAVING removed. (after_having_inclusive/_exclusive would
    re-aggregate only surviving groups — swap the totals input from
    ``g`` to the filtered frame to get them.)

    The totals row surfaces as event_type NULL + row_kind='totals'
    (CH marks it as a separate block; a NULL key is the portable
    relational spelling, same as ROLLUP's grand-total row).

    Scale: ONE scan of events — the totals and the group-count
    threshold re-aggregate the per-group partials (|groups| rows), not
    the source; the broadcast of the 1-row totals costs nothing. The
    HAVING is integer-only (n·n_groups > tot_n) so engines cannot
    diverge on a float compare."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * F.lit(10000.0)).cast("long"))
        .cast("long")
        .alias("value_fp"),
    )
    t = g.agg(
        F.sum("n").cast("long").alias("tot_n"),
        F.sum("value_fp").cast("long").alias("tot_fp"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    groups = (
        g.crossJoin(F.broadcast(t))
        .filter(F.col("n") * F.col("n_groups") > F.col("tot_n"))
        .select("event_type", "n", "value_fp", F.lit("group").alias("row_kind"))
    )
    totals = t.select(
        F.lit(None).cast("string").alias("event_type"),
        F.col("tot_n").alias("n"),
        F.col("tot_fp").alias("value_fp"),
        F.lit("totals").alias("row_kind"),
    )
    return groups.unionAll(totals)


# ---------------------------------------------------------------------------
# d62b/d62c — CH totals_mode = after_having_inclusive / _exclusive
# ---------------------------------------------------------------------------

# CH's three totals_mode settings differ in WHICH rows feed the totals
# row (CH docs, settings `totals_mode` + `max_rows_to_group_by`):
#   before_having (d62):        every source row;
#   after_having_exclusive:     only rows of groups that passed HAVING;
#   after_having_inclusive:     rows of groups that passed HAVING PLUS
#                               the rows that never formed a group
#                               because max_rows_to_group_by overflowed.
# Without an overflow cap, inclusive == exclusive, so d62b models the
# cap deterministically: the 3 largest groups (by n, event_type
# tiebreak) are "admitted" to GROUP BY; the rest are overflow rows.
# At sf0.01 the three modes give three distinct totals
# (n = 10000 / 7994 / 4031) — the semantics are actually pinned apart.

_D62B_CAP = 3

_D62B_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT)
           AS value_fp
  FROM events GROUP BY event_type
), ranked AS (
  SELECT g.*, ROW_NUMBER() OVER (ORDER BY n DESC, event_type) AS rk FROM g
), adm AS (
  SELECT * FROM ranked WHERE rk <= {_D62B_CAP}
), ovf AS (
  SELECT * FROM ranked WHERE rk > {_D62B_CAP}
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
         CAST(COUNT(*) AS BIGINT) AS n_groups
  FROM adm
), surv AS (
  SELECT adm.event_type, adm.n, adm.value_fp
  FROM adm, t WHERE adm.n * t.n_groups > t.tot_n
)
SELECT event_type, n, value_fp, 'group' AS row_kind FROM surv
UNION ALL
SELECT CAST(NULL AS VARCHAR) AS event_type,
       CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(value_fp) AS BIGINT) AS value_fp,
       'totals' AS row_kind
FROM (SELECT n, value_fp FROM surv
      UNION ALL SELECT n, value_fp FROM ovf)
ORDER BY row_kind, event_type
"""


def _d62_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * F.lit(10000.0)).cast("long"))
        .cast("long")
        .alias("value_fp"),
    )


def _d62_totals_row(rows: DataFrame) -> DataFrame:
    return rows.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("value_fp").cast("long").alias("value_fp"),
    ).select(
        F.lit(None).cast("string").alias("event_type"),
        "n",
        "value_fp",
        F.lit("totals").alias("row_kind"),
    )


@register("d62b_totals_after_having_inclusive", oracle=_D62B_ORACLE, tier="T3")
def d62b_totals_after_having_inclusive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CH ``totals_mode = after_having_inclusive`` (with the
    ``max_rows_to_group_by`` overflow that makes it distinct from
    _exclusive): totals cover the HAVING-surviving groups PLUS every
    row that overflowed out of GROUP BY. The overflow cap is modeled
    deterministically — the 3 largest groups are admitted, the rest
    are overflow (CH's cap is arrival-order nondeterministic, which no
    engine pair can hash-match).

    Scale: identical to d62 — one scan of events, then all
    admit/HAVING/totals logic re-aggregates the |groups|-row partial.
    The ranking window is a single-partition sort over |groups| rows
    (group-cardinality-sized, NOT data-sized; fine at any SF)."""
    g = _d62_grouped(spark, sf_dir)
    w = Window.orderBy(F.desc("n"), F.asc("event_type"))
    ranked = g.withColumn("rk", F.row_number().over(w))
    adm = ranked.filter(F.col("rk") <= _D62B_CAP)
    ovf = ranked.filter(F.col("rk") > _D62B_CAP)
    t = adm.agg(
        F.sum("n").cast("long").alias("tot_n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    surv = (
        adm.crossJoin(F.broadcast(t))
        .filter(F.col("n") * F.col("n_groups") > F.col("tot_n"))
        .select("event_type", "n", "value_fp")
    )
    groups = surv.select(
        "event_type", "n", "value_fp", F.lit("group").alias("row_kind")
    )
    totals = _d62_totals_row(
        surv.select("n", "value_fp").unionAll(ovf.select("n", "value_fp"))
    )
    return groups.unionAll(totals)


_D62C_ORACLE = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT)
           AS value_fp
  FROM events GROUP BY event_type
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
         CAST(COUNT(*) AS BIGINT) AS n_groups
  FROM g
), surv AS (
  SELECT g.event_type, g.n, g.value_fp
  FROM g, t WHERE g.n * t.n_groups > t.tot_n
)
SELECT event_type, n, value_fp, 'group' AS row_kind FROM surv
UNION ALL
SELECT CAST(NULL AS VARCHAR) AS event_type,
       CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(value_fp) AS BIGINT) AS value_fp,
       'totals' AS row_kind
FROM surv
ORDER BY row_kind, event_type
"""


@register("d62c_totals_after_having_exclusive", oracle=_D62C_ORACLE, tier="T3")
def d62c_totals_after_having_exclusive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CH ``totals_mode = after_having_exclusive``: the totals row
    re-aggregates ONLY the groups that survived HAVING (d62's docstring
    sketch, now a checked operator). Same HAVING as d62 (integer-only
    n·n_groups > tot_n), so d62 and d62c return the same group rows
    with provably different totals (sf0.01: 10000 vs 4031 events).

    Scale: one scan; totals re-aggregate the surviving |groups| rows."""
    g = _d62_grouped(spark, sf_dir)
    t = g.agg(
        F.sum("n").cast("long").alias("tot_n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    surv = (
        g.crossJoin(F.broadcast(t))
        .filter(F.col("n") * F.col("n_groups") > F.col("tot_n"))
        .select("event_type", "n", "value_fp")
    )
    groups = surv.select(
        "event_type", "n", "value_fp", F.lit("group").alias("row_kind")
    )
    return groups.unionAll(_d62_totals_row(surv))


# ---------------------------------------------------------------------------
# d63_any_family — CH any() / anyLast() / anyHeavy() (deterministic forms)
# ---------------------------------------------------------------------------

# CH's any()/anyLast() return "first/last value encountered" — defined
# only relative to an order, and CH itself documents the result as
# arbitrary under parallel execution. The engine-portable contract:
# "first/last" by the event-time total order (ts_us, event_id), packed
# into one zero-padded sortable string (the d6 min_by/max_by pack,
# because DuckDB's arg_min cannot order by a struct). anyHeavy() is a
# heavy-hitter sketch in CH; the deterministic stand-in is the exact
# mode with ties broken toward the smallest value.
_D63_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(FLOOR(value * 10000.0) AS BIGINT) AS value_fp,
         CONCAT(lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0'),
                '|', lpad(CAST(event_id AS VARCHAR), 12, '0')) AS ord_key
  FROM events
), per_value AS (
  SELECT event_type, value_fp,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         MIN(ord_key) AS kmin, MAX(ord_key) AS kmax
  FROM e GROUP BY event_type, value_fp
)
SELECT event_type,
       min_by(value_fp, kmin) AS any_value,
       max_by(value_fp, kmax) AS any_last,
       max_by(value_fp, CONCAT(lpad(CAST(cnt AS VARCHAR), 12, '0'), '|',
                               lpad(CAST(9999999 - value_fp AS VARCHAR), 7,
                                    '0'))) AS any_heavy,
       CAST(MAX(cnt) AS BIGINT) AS heavy_cnt
FROM per_value
GROUP BY event_type
ORDER BY event_type
"""


@register("d63_any_family", oracle=_D63_ORACLE, tier="T3")
def d63_any_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``any()`` / ``anyLast()`` / ``anyHeavy()`` with deterministic
    contracts: any = value at the MINIMUM (ts, event_id) order key,
    anyLast = value at the maximum, anyHeavy = the exact mode (ties →
    smallest value; CH's anyHeavy is an approximate heavy-hitter — the
    exact mode is its deterministic, hash-checkable refinement).
    Values surface fixed-point (FLOOR(value·1e4)) so the argmax packs
    into the zero-padded string key both engines order identically.

    Scale: two map-side-combinable hash aggregates — (type, value)
    then type — so the mode never materializes a group; the first
    shuffle carries |distinct (type,value)| rows, the second |types|.
    This IS how you spell mode at 100 TB (no collect_list, no window
    over the raw rows)."""
    ev = load(spark, sf_dir, "events")
    ord_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    per_value = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * F.lit(10000.0)).cast("long").alias("value_fp"),
            ord_key.alias("ord_key"),
        )
        .groupBy("event_type", "value_fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("ord_key").alias("kmin"),
            F.max("ord_key").alias("kmax"),
        )
    )
    heavy_key = F.concat(
        F.lpad(F.col("cnt").cast("string"), 12, "0"),
        F.lit("|"),
        F.lpad((F.lit(9999999) - F.col("value_fp")).cast("string"), 7, "0"),
    )
    return (
        per_value.groupBy("event_type")
        .agg(
            F.min_by("value_fp", F.col("kmin")).alias("any_value"),
            F.max_by("value_fp", F.col("kmax")).alias("any_last"),
            F.max_by("value_fp", heavy_key).alias("any_heavy"),
            F.max("cnt").cast("long").alias("heavy_cnt"),
        )
    )
