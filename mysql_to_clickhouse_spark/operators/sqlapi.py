"""The SQL entry point (SURVEY.md §3.2 entry point 2): the same engine
surface consumed as SQL text via spark.sql over registered views —
parser → same Catalyst plan as the DataFrame API.

The Spark-dialect SQL uses the same fixed-point expressions as the
DataFrame forms, so the DuckDB oracles hash-match identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql_to_clickhouse_spark.functions.numeric import o_dmean, o_dsum
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

_S1_SPARK_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0
    AS sum_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT))
       AS DOUBLE) / 10000.0 AS sum_disc_price,
  COUNT(*) AS count_order
FROM {li}
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_S1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {o_dsum('l_quantity')} AS sum_qty,
  {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("s1_sql_pricing", oracle=_S1_ORACLE)
def s1_sql_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape written as SQL text — proving the SQL surface
    resolves to the same results (and the same Catalyst machinery) as
    the DataFrame form (d1_group_basic)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("s1_lineitem")
    return spark.sql(_S1_SPARK_SQL.format(li="s1_lineitem"))


_S2_SPARK_SQL = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn
  FROM {orders}
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
)
WHERE rn <= 2
"""

_S2_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS BIGINT) AS rn
  FROM orders
)
SELECT * FROM ranked WHERE rn <= 2
"""


@register("s2_sql_window_qualify", oracle=_S2_ORACLE)
def s2_sql_window_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL WINDOW clause + ranked-subquery filter (the top-k-per-group
    idiom; Spark's parser has no QUALIFY) through the SQL surface."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("s2_orders")
    return spark.sql(_S2_SPARK_SQL.format(orders="s2_orders"))


_S3_SPARK_SQL = """
SELECT c_custkey, c_name,
       (SELECT COUNT(*) FROM {orders} o WHERE o.o_custkey = c.c_custkey)
         AS n_orders,
       (SELECT COALESCE(CAST(SUM(CAST(FLOOR(o2.o_totalprice * 10000.0)
                 AS BIGINT)) AS DOUBLE) / 10000.0, 0.0)
        FROM {orders} o2 WHERE o2.o_custkey = c.c_custkey) AS total_spent
FROM {cust} c
WHERE c_custkey <= 200
"""

_S3_ORACLE = f"""
SELECT c_custkey, c_name,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
         AS n_orders,
       (SELECT COALESCE({o_dsum('o2.o_totalprice')}, 0.0)
        FROM orders o2 WHERE o2.o_custkey = c.c_custkey) AS total_spent
FROM customer c
WHERE c_custkey <= 200
ORDER BY c_custkey
"""


@register("s3_scalar_subquery", oracle=_S3_ORACLE, tier="T2")
def s3_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries through the SQL entry point — the
    query-compat surface migrating reporting SQL leans on hardest.
    Catalyst de-correlates each subquery into an aggregate + left outer
    join (no per-row re-execution, unlike row-store engines), so the
    plan is two joins on o_custkey at any scale."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("s3_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("s3_orders")
    return spark.sql(
        _S3_SPARK_SQL.format(cust="s3_customer", orders="s3_orders")
    )


_S4_SPARK_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders
FROM {orders}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

_S4_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST,
         o_orderpriority NULLS FIRST
"""


@register("s4_grouping_sets", oracle=_S4_ORACLE, tier="T2")
def s4_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT GROUPING SETS — the general form d9's ROLLUP and d10's
    CUBE are sugar for: exactly the requested subtotal combinations
    ((status), (priority), (grand total)), no cross-product of levels.
    Spark plans one Expand (3 output rows per input) + a single hash
    aggregate — the same one-shuffle shape as rollup/cube."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("s4_orders")
    return spark.sql(_S4_SPARK_SQL.format(orders="s4_orders"))


_S5_SPARK_SQL = """
SELECT n_name, t.c_custkey, t.c_acctbal
FROM {nation},
LATERAL (SELECT c_custkey, c_acctbal FROM {customer}
         WHERE c_nationkey = n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
"""

_S5_ORACLE = """
SELECT n_name, t.c_custkey, t.c_acctbal
FROM nation,
LATERAL (SELECT c_custkey, c_acctbal FROM customer
         WHERE c_nationkey = n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
ORDER BY n_name, c_custkey
"""


@register("s5_lateral_topk", oracle=_S5_ORACLE)
def s5_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT —
    the SQL-standard way to write "top 2 customers per nation" that
    both engines accept verbatim (identical query text on both sides).
    Catalyst decorrelates the lateral into a ranked window join — the
    same physical shape as s2's QUALIFY/row_number form, so the lateral
    syntax costs nothing at scale versus the hand-rewritten window (one
    partitioned rank exchange; no per-outer-row re-execution)."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("s5_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("s5_customer")
    return spark.sql(
        _S5_SPARK_SQL.format(nation="s5_nation", customer="s5_customer")
    )


_S6_ORACLE = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_acctbal >= ALL (SELECT c_acctbal FROM customer
                        WHERE c_mktsegment = 'BUILDING')
ORDER BY s_suppkey
"""


@register("s6_quantified_all", oracle=_S6_ORACLE)
def s6_quantified_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison — the oracle states ``>= ALL (subquery)``
    verbatim; Spark SQL has no ALL/ANY quantifier, so the engine form
    IS the decorrelation every optimizer applies to it: the subquery
    collapses to one scalar aggregate (max over an empty set yielding
    NULL must admit every row — hence the coalesce to -infinity)
    broadcast against the outer relation. One tiny aggregate + one
    broadcast cross join; never a per-outer-row re-execution."""
    from pyspark.sql import functions as F

    sup = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    mx = cust.filter(F.col("c_mktsegment") == "BUILDING").agg(
        F.coalesce(F.max("c_acctbal"), F.lit(float("-inf"))).alias("_max_bal")
    )
    return (
        sup.crossJoin(F.broadcast(mx))
        .filter(F.col("s_acctbal") >= F.col("_max_bal"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# s7_not_in_nulls — three-valued NOT IN vs null-safe anti join
# ---------------------------------------------------------------------------

# NOT IN against a set containing NULL is empty under SQL three-valued
# logic (x <> NULL is UNKNOWN); the intended "not present" semantics is
# the null-filtered anti join. This query surfaces BOTH counts so the
# trap and its fix are pinned side by side. The planted NULL comes from
# a LEFT JOIN miss (customers with no orders above the threshold).
_S7_SPARK_SQL = """
WITH probe AS (
  SELECT n.n_nationkey AS k
  FROM {nation} n
), keyset AS (
  -- nationkeys of customers with a huge-balance account, plus a NULL
  -- (the classic accidental NULL from an outer-join-derived IN list)
  SELECT c_nationkey AS k FROM {customer} WHERE c_acctbal > 9000
  UNION ALL
  SELECT CAST(NULL AS BIGINT) AS k
)
SELECT
  (SELECT COUNT(*) FROM probe) AS n_probe,
  (SELECT COUNT(*) FROM probe
    WHERE k NOT IN (SELECT k FROM keyset)) AS not_in_with_null,
  (SELECT COUNT(*) FROM probe
    WHERE k NOT IN (SELECT k FROM keyset WHERE k IS NOT NULL))
    AS anti_join_semantics
"""

_S7_ORACLE = """
WITH probe AS (
  SELECT n.n_nationkey AS k
  FROM nation n
), keyset AS (
  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT CAST(NULL AS BIGINT) AS k
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_probe,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM probe
    WHERE k NOT IN (SELECT k FROM keyset)) AS not_in_with_null,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM probe
    WHERE k NOT IN (SELECT k FROM keyset WHERE k IS NOT NULL))
    AS anti_join_semantics
"""


@register("s7_not_in_nulls", oracle=_S7_ORACLE)
def s7_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``NOT IN`` three-valued-logic semantics: a NULL in the subquery
    list annihilates the whole predicate (0 rows), while the
    null-filtered form gives the intended anti-join answer — both
    counts surfaced, hash-checked against DuckDB's identical SQL.

    Scale: Spark plans NOT IN as a null-aware anti join
    (BroadcastNestedLoopJoin only when the build side might hold a
    NULL); the null-filtered form degrades to a plain broadcast anti
    join — exactly why pipelines should always write the filtered
    form."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("s7_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("s7_customer")
    return spark.sql(
        _S7_SPARK_SQL.format(nation="s7_nation", customer="s7_customer")
    )


# ---------------------------------------------------------------------------
# s8_group_by_all — GROUP BY ALL / ORDER BY ALL (shared modern syntax)
# ---------------------------------------------------------------------------

# IDENTICAL text runs on both engines — the point: the modern implicit
# grouping syntax (every non-aggregate select item becomes a key)
# resolves the same way in Spark 4, DuckDB, and ClickHouse.
_S8_SQL = """
SELECT event_type,
       CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT)
         AS value_fp
FROM events
GROUP BY ALL
ORDER BY ALL
"""


@register("s8_group_by_all", oracle=_S8_SQL, tier="T3")
def s8_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL``: the implicit-key grouping
    syntax ClickHouse, DuckDB, and Spark 4 all ship — every
    non-aggregate select item becomes a grouping key, and the result
    orders by the full projection. One SQL string, verbatim on both
    engines, proving the resolution rules agree (including that the
    EXTRACT alias participates as a KEY, not an aggregate).

    Scale: resolves to the same hash aggregate an explicit GROUP BY
    plans — syntax sugar, zero plan cost."""
    from mysql_to_clickhouse_spark.tables import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_S8_SQL)


# ---------------------------------------------------------------------------
# s9_limit_by — ClickHouse LIMIT n BY key (per-group row limit clause)
# ---------------------------------------------------------------------------

# CH: SELECT ... ORDER BY o LIMIT n BY k — keep the first n rows of
# each k-group under the query's ORDER BY, then apply any outer LIMIT.
# Spark has no LIMIT BY syntax; the engine's spelling is the QUALIFY
# row_number form, which DuckDB can run VERBATIM — one SQL text, both
# engines (the s8 discipline), pinning that the rewrite is the idiom.
_S9_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
)
SELECT user_id, event_id, event_type, ts_us
FROM e
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id ORDER BY ts_us DESC, event_id
) <= 3
ORDER BY user_id, ts_us DESC, event_id
"""

_S9_SPARK_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, unix_micros(ts) AS ts_us
  FROM events
), r AS (
  SELECT user_id, event_id, event_type, ts_us,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts_us DESC, event_id
         ) AS rn
  FROM e
)
SELECT user_id, event_id, event_type, ts_us
FROM r WHERE rn <= 3
ORDER BY user_id, ts_us DESC, event_id
"""


@register("s9_limit_by", oracle=_S9_SQL, tier="T3")
def s9_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LIMIT n BY key``: each user's 3 most recent events (the
    "last N per entity" report, CH's most-used nonstandard clause).
    Engine spelling: ROW_NUMBER() ≤ n over (key, query order) — the
    exact rewrite CH applies internally. OSS Spark has no QUALIFY, so
    the rank lives in a subquery; the DuckDB oracle states the QUALIFY
    form, pinning that the two spellings are the same operator.

    Scale: ONE shuffle on user_id; Spark 4 plans the rank bound as
    WindowGroupLimit, pruning to ≤ n rows per key map-side BEFORE the
    exchange — the 100 TB plan you want for per-entity recency slices
    (asserted on THIS query's executed plan:
    tests/test_plans.py::test_s9_limit_by_windowgrouplimit_own_plan)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_S9_SPARK_SQL)


# ---------------------------------------------------------------------------
# s9b — CH LIMIT n OFFSET m BY key
# ---------------------------------------------------------------------------

_S9B_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
)
SELECT user_id, event_id, event_type, ts_us
FROM e
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id ORDER BY ts_us DESC, event_id
) BETWEEN 3 AND 5
ORDER BY user_id, ts_us DESC, event_id
"""

_S9B_SPARK_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, unix_micros(ts) AS ts_us
  FROM events
), r AS (
  SELECT user_id, event_id, event_type, ts_us,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts_us DESC, event_id
         ) AS rn
  FROM e
)
SELECT user_id, event_id, event_type, ts_us
FROM r WHERE rn BETWEEN 3 AND 5
ORDER BY user_id, ts_us DESC, event_id
"""


@register("s9b_limit_offset_by", oracle=_S9B_SQL, tier="T3")
def s9b_limit_offset_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LIMIT 3 OFFSET 2 BY user_id``: per-entity pagination — skip
    each user's 2 most recent events, take the next 3 (ranks 3..5 in
    the recency order). Same internal rewrite as s9 with a two-sided
    rank band; the oracle states the QUALIFY BETWEEN form.

    Scale: identical plan family to s9 — one shuffle on user_id, and
    the UPPER bound still drives Spark's WindowGroupLimit map-side
    prune to ≤ offset+n rows per key per input partition (the offset
    cannot prune below the bound: rank 3 on a partition slice could be
    rank ≤ 5 globally, so shipping offset+n rows is the information-
    theoretic minimum for distributed pagination)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_S9B_SPARK_SQL)


# ---------------------------------------------------------------------------
# s10_with_fill — ClickHouse ORDER BY ... WITH FILL FROM a TO b STEP s
# ---------------------------------------------------------------------------

# CH: SELECT h, count() FROM ... GROUP BY h
#     ORDER BY h WITH FILL FROM toDateTime('2024-01-01 00:00:00')
#                          TO   toDateTime('2024-01-31 00:00:00')
#                          STEP INTERVAL 1 HOUR
# — the ordered result is densified: every step of the literal range
# appears, absent buckets as zero rows. The engine spelling is an
# explicit generated spine LEFT-JOINed to the aggregate; the DuckDB
# oracle states the same with generate_series.

_S10_SPARK_SQL = """
WITH agg AS (
  SELECT date_trunc('HOUR', ts) AS h,
         COUNT(*) AS n_events,
         SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS sum_fp
  FROM events
  WHERE event_type = 'error' AND value > 300.0
  GROUP BY date_trunc('HOUR', ts)
), spine AS (
  SELECT explode(sequence(
    TIMESTAMP '2024-01-01 00:00:00',
    TIMESTAMP '2024-01-30 23:00:00',
    INTERVAL 1 HOUR)) AS h
)
SELECT unix_micros(s.h) AS h_us,
       COALESCE(a.n_events, 0) AS n_events,
       COALESCE(a.sum_fp, 0) AS sum_fp
FROM spine s LEFT JOIN agg a ON s.h = a.h
ORDER BY h_us
"""

_S10_ORACLE = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS h,
         COUNT(*) AS n_events,
         SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS sum_fp
  FROM events
  WHERE event_type = 'error' AND value > 300.0
  GROUP BY 1
), spine AS (
  SELECT unnest(generate_series(
    TIMESTAMP '2024-01-01 00:00:00',
    TIMESTAMP '2024-01-30 23:00:00',
    INTERVAL 1 HOUR)) AS h
)
SELECT epoch_us(s.h) AS h_us,
       CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(a.sum_fp, 0) AS BIGINT) AS sum_fp
FROM spine s LEFT JOIN agg a ON s.h = a.h
ORDER BY h_us
"""


@register("s10_with_fill", oracle=_S10_ORACLE, tier="T3")
def s10_with_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``ORDER BY h WITH FILL FROM ... TO ... STEP INTERVAL 1 HOUR``:
    densify a sparse hourly report over a literal 720-hour January
    spine — absent buckets appear as zero rows, the monitoring-
    dashboard idiom WITH FILL exists for. Engine spelling: a generated
    ``sequence()`` spine LEFT-JOINed to the aggregate (the rewrite CH
    performs in its ORDER BY transform); the DuckDB oracle states the
    identical ``generate_series`` form.

    Scale: the spine is (b-a)/s literal rows — broadcast it; the
    aggregate side is the usual map-side-combined hash agg, so the
    fill costs one broadcast-hash-join over an already-tiny grouped
    result, never a shuffle of the fact table. The sparse filter is
    pushed to the parquet scan."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_S10_SPARK_SQL)


# ---------------------------------------------------------------------------
# s10b — WITH FILL ... INTERPOLATE (col) — carry-forward over filled rows
# ---------------------------------------------------------------------------

_S10B_SPARK_SQL = """
WITH agg AS (
  SELECT date_trunc('HOUR', ts) AS h,
         COUNT(*) AS n_events,
         SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS sum_fp
  FROM events
  WHERE event_type = 'error' AND value > 300.0
  GROUP BY date_trunc('HOUR', ts)
), spine AS (
  SELECT explode(sequence(
    TIMESTAMP '2024-01-01 00:00:00',
    TIMESTAMP '2024-01-30 23:00:00',
    INTERVAL 1 HOUR)) AS h
), filled AS (
  SELECT s.h, a.n_events, a.sum_fp
  FROM spine s LEFT JOIN agg a ON s.h = a.h
)
SELECT unix_micros(h) AS h_us,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(LAST_VALUE(sum_fp) IGNORE NULLS OVER (
         ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 0) AS interp_fp
FROM filled
ORDER BY h_us
"""

_S10B_ORACLE = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS h,
         COUNT(*) AS n_events,
         SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS sum_fp
  FROM events
  WHERE event_type = 'error' AND value > 300.0
  GROUP BY 1
), spine AS (
  SELECT unnest(generate_series(
    TIMESTAMP '2024-01-01 00:00:00',
    TIMESTAMP '2024-01-30 23:00:00',
    INTERVAL 1 HOUR)) AS h
), filled AS (
  SELECT s.h, a.n_events, a.sum_fp
  FROM spine s LEFT JOIN agg a ON s.h = a.h
)
SELECT epoch_us(h) AS h_us,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(LAST_VALUE(sum_fp IGNORE NULLS) OVER (
         ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 0) AS BIGINT) AS interp_fp
FROM filled
ORDER BY h_us
"""


@register("s10b_with_fill_interpolate", oracle=_S10B_ORACLE, tier="T3")
def s10b_with_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``WITH FILL ... INTERPOLATE (sum_fp AS sum_fp)``: filled rows
    carry the PREVIOUS observed value forward instead of a default —
    the staircase a metrics dashboard draws between samples. Engine
    spelling: the s10 spine join plus ``LAST_VALUE IGNORE NULLS`` over
    the spine order (running carry-forward); hours before the first
    observation fall back to 0. One SQL shape, both engines — only the
    IGNORE NULLS placement differs by dialect (Spark: after the call;
    DuckDB: inside the argument list).

    Scale: the carry-forward window is ordered by the spine, which is
    (b-a)/s rows regardless of fact-table size — a single-partition
    window over hundreds of rows, after the fact table has already
    collapsed through the map-side-combined agg. The e11 interpolate
    operator is the per-entity DataFrame twin; this is the SQL-surface
    spelling over a literal range."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_S10B_SPARK_SQL)


# ---------------------------------------------------------------------------
# s11_distinct_on — CH LIMIT 1 BY == PostgreSQL/DuckDB DISTINCT ON
# ---------------------------------------------------------------------------

_S11_SPARK_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, unix_micros(ts) AS ts_us
  FROM events
), r AS (
  SELECT user_id, event_id, event_type, ts_us,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts_us DESC, event_id
         ) AS rn
  FROM e
)
SELECT user_id, event_id, event_type, ts_us
FROM r WHERE rn = 1
ORDER BY user_id
"""

_S11_ORACLE = """
SELECT DISTINCT ON (user_id)
       user_id, event_id, event_type,
       epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
FROM events
ORDER BY user_id, ts_us DESC, event_id
"""


@register("s11_distinct_on", oracle=_S11_ORACLE, tier="T3")
def s11_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LIMIT 1 BY user_id`` == Postgres/DuckDB ``DISTINCT ON``:
    each user's single most-recent event. The oracle states DuckDB's
    NATIVE ``DISTINCT ON`` clause — not a rewrite — so the hash match
    pins that the engine's ROW_NUMBER()=1 spelling implements exactly
    the first-row-per-key-under-the-sort semantics that clause defines
    (including the event_id tie-break).

    Scale: the s9 plan family — one shuffle on user_id with the rank
    bound planned as WindowGroupLimit, ≤1 row per key shipped from each
    map partition. A groupBy(max_by) spelling would plan the same
    single exchange; the window form keeps the full-row projection
    without a struct repack."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_S11_SPARK_SQL)


# ---------------------------------------------------------------------------
# s12_star_except — SELECT * EXCEPT(...) projection modifier
# ---------------------------------------------------------------------------

_S12_SPARK_SQL = """
SELECT * EXCEPT (ts, props, value),
       unix_micros(ts) AS ts_us,
       CAST(FLOOR(value * 10000.0) AS BIGINT) AS value_fp
FROM events
WHERE event_type IN ('signup', 'purchase')
"""

_S12_ORACLE = """
SELECT * EXCLUDE (ts, props, value),
       epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       CAST(FLOOR(value * 10000.0) AS BIGINT) AS value_fp
FROM events
WHERE event_type IN ('signup', 'purchase')
"""


@register("s12_star_except", oracle=_S12_ORACLE, tier="T3")
def s12_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH/Spark ``SELECT * EXCEPT(cols)`` == DuckDB ``* EXCLUDE`` — the
    wide-table projection modifier replication users lean on when a
    table has hundreds of columns and only a few must be dropped or
    re-derived. One negative-projection text per dialect, same result
    set; the re-derived ts/value columns keep the hash discipline.

    Scale: EXCEPT is resolved at analysis time into an ordinary
    projection, so column pruning still reaches the parquet scan — the
    excluded columns are never read (ts/value are, being re-derived).
    Zero runtime cost vs an explicit column list."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_S12_SPARK_SQL)


# ---------------------------------------------------------------------------
# s13 family — the ClickHouse-DIALECT entry point: CH function names
# resolving near-verbatim through spark.sql (functions/chdialect.py).
# A reference-category user's query text, not a restatement of it.
# ---------------------------------------------------------------------------

from mysql_to_clickhouse_spark.functions.chdialect import ch_sql  # noqa: E402

_S13_CH_SQL = """
SELECT toYYYYMMDD(ts) AS ymd,
       toYYYYMM(ts) AS ym,
       countIf(event_type = 'purchase') AS purchases,
       countIf(user_id, event_type = 'view') AS view_user_rows,
       COALESCE(sumIf(CAST(FLOOR(value * 10000.0) AS BIGINT),
                      event_type = 'purchase'), 0) AS purchase_value_fp,
       uniqExact(user_id) AS users,
       argMax(user_id, event_id) AS latest_event_user,
       quantileExact(0.5)(CAST(FLOOR(value * 10000.0) AS BIGINT))
         AS median_value_fp,
       multiIf(countIf(event_type = 'error') = 0, 'clean',
               countIf(event_type = 'error') < 10, 'low',
               'high') AS error_band
FROM events
GROUP BY toYYYYMMDD(ts), toYYYYMM(ts)
ORDER BY ymd
"""

_S13_ORACLE = """
SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS INT) AS ymd,
       CAST(year(ts) * 100 + month(ts) AS INT) AS ym,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS purchases,
       CAST(COUNT(user_id) FILTER (WHERE event_type = 'view') AS BIGINT)
         AS view_user_rows,
       CAST(COALESCE(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT))
                     FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT)
         AS purchase_value_fp,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
       arg_max(user_id, event_id) AS latest_event_user,
       quantile_cont(CAST(FLOOR(value * 10000.0) AS BIGINT), 0.5)
         AS median_value_fp,
       CASE WHEN COUNT(*) FILTER (WHERE event_type = 'error') = 0 THEN 'clean'
            WHEN COUNT(*) FILTER (WHERE event_type = 'error') < 10 THEN 'low'
            ELSE 'high' END AS error_band
FROM events
GROUP BY 1, 2
ORDER BY ymd
"""


@register("s13_ch_dialect_report", oracle=_S13_ORACLE)
def s13_ch_dialect_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A daily KPI report written in ClickHouse SQL — countIf (both
    arities), sumIf, uniqExact, argMax, parametric quantileExact,
    multiIf, toYYYYMM(DD) — running near-verbatim through the dialect
    layer. The aggregate names translate (Spark SQL UDFs cannot hold
    aggregate bodies); the scalar names are REAL registered functions.

    Scale: everything here inlines to builtin expressions under
    whole-stage codegen — one map-side-combinable aggregate over one
    scan, identical to writing the Spark names directly (plan-asserted
    in tests/test_chdialect.py). argMax ties broken by unique event_id;
    sums ride the fixed-point discipline."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S13_CH_SQL)


_S13B_CH_SQL = """
SELECT JSONExtractInt(props, 'k') AS k,
       COUNT(*) AS n,
       countIf(JSONHas(props, 'k')) AS with_k,
       uniqExact(JSONExtractString(props, 'k')) AS k_strs,
       COALESCE(minIf(event_id, event_id % 2 = 0), -1) AS min_even_eid,
       COALESCE(maxIf(event_id, event_id % 2 = 1), -1) AS max_odd_eid,
       toInt32(COUNT(*) % 1000) AS n_mod
FROM events
GROUP BY JSONExtractInt(props, 'k')
ORDER BY k
"""

_S13B_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       COUNT(*) AS n,
       CAST(COUNT(*) FILTER (
         WHERE json_extract_string(props, '$.k') IS NOT NULL) AS BIGINT)
         AS with_k,
       CAST(COUNT(DISTINCT json_extract_string(props, '$.k')) AS BIGINT)
         AS k_strs,
       CAST(COALESCE(MIN(event_id) FILTER (WHERE event_id % 2 = 0), -1)
            AS BIGINT) AS min_even_eid,
       CAST(COALESCE(MAX(event_id) FILTER (WHERE event_id % 2 = 1), -1)
            AS BIGINT) AS max_odd_eid,
       CAST(COUNT(*) % 1000 AS INT) AS n_mod
FROM events
GROUP BY 1
ORDER BY k
"""


@register("s13b_ch_dialect_json", oracle=_S13B_ORACLE, tier="T2")
def s13b_ch_dialect_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH JSON + -If-combinator surface: JSONExtractInt/String, JSONHas,
    minIf/maxIf, uniqExact, toInt32 — grouped by an extracted JSON key,
    as a replication user slices a MySQL JSON column after cutover.

    Scale: get_json_object evaluates JVM-side per row off one scan; the
    grouped aggregate is map-side combinable on the ~100-value key."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S13B_CH_SQL)


_S13C_CH_SQL = """
SELECT tok, COUNT(*) AS n
FROM (
  SELECT arrayJoin(splitByChar(' ', lower(text))) AS tok
  FROM documents
)
WHERE notEmpty(tok) AND lengthUTF8(tok) >= 3
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
"""

_S13C_ORACLE = """
SELECT tok, COUNT(*) AS n
FROM (
  SELECT unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
)
WHERE length(tok) > 0 AND length(tok) >= 3
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
"""


@register("s13c_ch_dialect_tokens", oracle=_S13C_ORACLE, tier="T2")
def s13c_ch_dialect_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH array surface over documents: arrayJoin (lateral expansion ->
    explode), splitByChar (literal split via \\Q...\\E regex-quoting),
    notEmpty, lengthUTF8 — the top-20 token frequency query every CH
    text corpus gets pointed at.

    Scale: explode is generate-side (no shuffle); the token aggregate
    shuffles |distinct tokens| partial counts — the i5/i6 text-stats
    bound, unchanged by the dialect spelling."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return ch_sql(spark, _S13C_CH_SQL)


_S13D_CH_SQL = """
SELECT toString(toStartOfMonth(ts)) AS month_start,
       toDayOfWeek(ts) AS dow,
       COUNT(*) AS n,
       uniqExact(toStartOfDay(ts)) AS active_days,
       toString(MIN(toMonday(ts))) AS first_week_start,
       MAX(toUnixTimestamp(toStartOfHour(ts))) AS last_hour_unix,
       uniqExact(toHour(ts)) AS hours_seen
FROM events
GROUP BY toStartOfMonth(ts), toDayOfWeek(ts)
ORDER BY month_start, dow
"""

_S13D_ORACLE = """
SELECT CAST(CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE)
            AS VARCHAR) AS month_start,
       CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
       COUNT(*) AS n,
       CAST(COUNT(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)))
            AS BIGINT) AS active_days,
       CAST(CAST(MIN(date_trunc('week', CAST(ts AS TIMESTAMP))) AS DATE)
            AS VARCHAR) AS first_week_start,
       CAST(MAX(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))))
            AS BIGINT) AS last_hour_unix,
       CAST(COUNT(DISTINCT hour(CAST(ts AS TIMESTAMP))) AS BIGINT)
         AS hours_seen
FROM events
GROUP BY 1, 2
ORDER BY month_start, dow
"""


@register("s13d_ch_dialect_dates", oracle=_S13D_ORACLE, tier="T2")
def s13d_ch_dialect_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH date-bucketing surface: toStartOfMonth/Day/Hour, toMonday,
    toDayOfWeek (CH ISO numbering, Monday=1 — shimmed over Spark's
    Sunday=1), toUnixTimestamp, toHour, toString — the calendar
    roll-ups a CH dashboard is built from, all REAL registered
    functions (no translation involved for the scalar names).

    Scale: every bucket is a deterministic scalar of ts — inlined
    builtin expressions, one combinable aggregate, one scan."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S13D_CH_SQL)


_S13E_CH_SQL = """
SELECT event_type,
       uniqExact(user_id) AS users,
       COUNT(*) AS n,
       COALESCE(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)), 0)
         AS latest_value_fp,
       argMax(user_id, value * 10000.0 - event_id * 0.000001)
         AS top_value_user
FROM events FINAL
PREWHERE user_id % 3 = 1
WHERE value > 10.0
GROUP BY event_type
ORDER BY event_type
"""

_S13E_ORACLE = """
WITH final AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id
      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC
    ) AS __rn
    FROM events
  ) WHERE __rn = 1 AND NOT (event_type = 'error')
)
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
       COUNT(*) AS n,
       CAST(COALESCE(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)), 0)
            AS BIGINT) AS latest_value_fp,
       arg_max(user_id, value * 10000.0 - event_id * 0.000001)
         AS top_value_user
FROM final
WHERE user_id % 3 = 1 AND value > 10.0
GROUP BY event_type
ORDER BY event_type
"""


@register("s13e_ch_dialect_final", oracle=_S13E_ORACLE, tier="T2")
def s13e_ch_dialect_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH STATEMENT idioms a migrating user carries in every query:
    ``FROM events FINAL`` (ReplacingMergeTree read semantics — expanded
    by the dialect layer into the a4 latest-per-key collapse from the
    table's registered FinalSpec) and ``PREWHERE`` (merged into WHERE;
    Spark's own predicate pushdown already does what PREWHERE asks for
    by hand), composed with the dialect aggregates on top. The oracle
    restates the collapse as a DuckDB window CTE — hash equality proves
    the expansion picks exactly the same surviving row versions.

    Scale: identical bound to a4/x17 — the collapse window is the one
    fact-scale exchange; PREWHERE/WHERE both push to the scan."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S13E_CH_SQL)


_S13F_CH_SQL = """
SELECT event_type,
       uniqExactIf(user_id, value > 100.0) AS hi_users,
       CAST(medianExact(toInt64(user_id % 1000)) AS DOUBLE) AS med_bucket,
       COALESCE(sumIf(toInt64(lengthUTF8(props)),
                      has(extractAll(props, '[0-9]+'), '7')), 0) AS len7,
       COALESCE(maxIf(toUInt32(user_id % 997), match(event_type, '^s')),
                -1) AS mx
FROM events
PREWHERE isNotNull(props)
WHERE modulo(user_id, 2) = 0
GROUP BY event_type
ORDER BY event_type
"""

_S13F_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT CASE WHEN value > 100.0 THEN user_id END)
            AS BIGINT) AS hi_users,
       CAST(median(CAST(user_id % 1000 AS BIGINT)) AS DOUBLE) AS med_bucket,
       CAST(COALESCE(SUM(CAST(length(props) AS BIGINT)) FILTER (
            WHERE list_contains(regexp_extract_all(props, '[0-9]+'), '7')),
            0) AS BIGINT) AS len7,
       CAST(COALESCE(MAX(CAST(user_id % 997 AS BIGINT)) FILTER (
            WHERE regexp_matches(event_type, '^s')), -1) AS BIGINT) AS mx
FROM events
WHERE props IS NOT NULL AND user_id % 2 = 0
GROUP BY event_type
ORDER BY event_type
"""


@register("s13f_ch_dialect_tranche2", oracle=_S13F_ORACLE, tier="T2")
def s13f_ch_dialect_tranche2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tranche-2 CH-dialect surface in one statement: uniqExactIf /
    maxIf / sumIf combinators, medianExact (exact interpolated
    percentile on both engines), the higher-order-adjacent specials
    (has + extractAll over the props digit runs), the unsigned-cast
    family (toUInt32 -> next-wider signed), match/modulo/isNotNull
    scalar renames, and the PREWHERE statement idiom merged into WHERE.
    Every name resolves through functions/chdialect.py; the oracle
    restates semantics with DuckDB natives (FILTER, list_contains,
    regexp_extract_all).

    Scale: one hash-agg exchange over the filtered scan; every scalar
    is Catalyst-inlined (no Python), so the map side stays in
    whole-stage codegen — same bound as d5/d8."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S13F_CH_SQL)


_S14_CH_SQL = """
SELECT event_type, user_id, event_id,
       toInt64(FLOOR(value * 10000.0)) AS value_fp
FROM events
ORDER BY value_fp DESC, event_id
LIMIT 3 BY event_type
"""

_S14_ORACLE = """
SELECT event_type, user_id, event_id, value_fp FROM (
  SELECT event_type, user_id, event_id,
         CAST(FLOOR(value * 10000.0) AS BIGINT) AS value_fp,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(FLOOR(value * 10000.0) AS BIGINT) DESC, event_id
         ) AS rn
  FROM events
) WHERE rn <= 3
"""


@register("s14_ch_limit_by", oracle=_S14_ORACLE, tier="T2")
def s14_ch_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LIMIT n BY keys`` — first-n-rows-per-key, the idiom CH
    users reach for before window functions — translated by the
    dialect layer into the e1 ranked-window shape: the rank is spliced
    into the SAME select scope (so it can order by columns the
    projection drops), output ordering survives projection via hidden
    __ob columns, and the filter is rank <= n. Deterministic here via
    the fixed-point value + event_id tie-break.

    Scale: identical bound to e1 — Spark plans the rank filter as
    WindowGroupLimit, pruning each partition to n rows map-side BEFORE
    the exchange, so the shuffle carries at most n rows per key."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S14_CH_SQL)


_S15_LO = (1 << 32) // 4
_S15_HI = _S15_LO + (1 << 32) // 8

_S15_CH_SQL = """
SELECT event_type,
       COUNT(*) AS sample_rows,
       uniqExact(user_id) AS sample_users,
       COALESCE(sumIf(toInt64(FLOOR(value * 10000.0)), value > 50.0), 0)
         AS hi_value_fp
FROM events SAMPLE 1/8 OFFSET 1/4
GROUP BY event_type
ORDER BY event_type
"""

_S15_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS sample_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS sample_users,
       CAST(COALESCE(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT))
            FILTER (WHERE value > 50.0), 0) AS BIGINT) AS hi_value_fp
FROM events
WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
      >= {_S15_LO}
  AND CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
      < {_S15_HI}
GROUP BY event_type
ORDER BY event_type
"""


@register("s15_ch_sample_clause", oracle=_S15_ORACLE, tier="T3")
def s15_ch_sample_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``FROM events SAMPLE 1/8 OFFSET 1/4`` as STATEMENT TEXT —
    the a32 deterministic md5 hash-band filter, reached through the
    dialect layer's per-table sample-key registry instead of the
    DataFrame API. Band arithmetic is integer-exact on both engines
    (DuckDB restates the identical prefix-to-band mapping), so the
    sampled subset — and therefore every aggregate over it — is
    hash-green, not rows-only.

    Scale: pure row-local predicate evaluated inside the scan stage;
    7/8 of rows drop before the one group-by exchange (a32's bound)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S15_CH_SQL)


_S16_CH_SQL = """
SELECT c.c_custkey, c.c_name,
       COALESCE(o.o_orderkey, -1) AS first_orderkey,
       COALESCE(toInt64(FLOOR(o.o_totalprice * 10000.0)), -1)
         AS first_price_fp,
       o.o_custkey IS NOT NULL AS matched
FROM customer AS c
LEFT ANY JOIN orders AS o ON c.c_custkey = o.o_custkey
ORDER BY c.c_custkey
"""

_S16_ORACLE = """
WITH one AS (
  SELECT * FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS __rn
    FROM orders
  ) WHERE __rn = 1
)
SELECT c.c_custkey, c.c_name,
       CAST(COALESCE(o.o_orderkey, -1) AS BIGINT) AS first_orderkey,
       CAST(COALESCE(CAST(FLOOR(o.o_totalprice * 10000.0) AS BIGINT), -1)
            AS BIGINT) AS first_price_fp,
       o.o_custkey IS NOT NULL AS matched
FROM customer c LEFT JOIN one o ON c.c_custkey = o.o_custkey
ORDER BY c.c_custkey
"""


@register("s16_ch_any_join", oracle=_S16_ORACLE, tier="T3")
def s16_ch_any_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LEFT ANY JOIN`` as STATEMENT TEXT — the c22 semantics
    (at most one right row per key) reached through the dialect
    layer's rewrite instead of the DataFrame operator: the right side
    collapses to one row per join key under the table's registered
    deterministic keep-one rule (orders: earliest o_orderdate, then
    o_orderkey — CH itself keeps an ARBITRARY first match, which no
    engine pair can hash-check), then joins normally. A CH user's
    pasted `LEFT ANY JOIN` statement now runs instead of raising
    (round-8 verdict gap #3).

    Scale: the collapse is a per-key ranked window PARTITIONED by the
    join key (no global window), and the join itself is whatever
    Catalyst picks for the collapsed side — identical shape to c22's
    dedup-then-join."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return ch_sql(spark, _S16_CH_SQL)


_S17_URL = (
    "concat('https://sh', toString(user_id % 5), '.example.org/p/', "
    "event_type, '?q=', toString(event_id % 97))"
)

_S17_CH_SQL = f"""
SELECT formatDateTime(toStartOfMonth(ts), '%Y-%m') AS month,
       domain({_S17_URL}) AS shard_domain,
       count(*) AS n,
       COALESCE(sumIf(toInt64(extractURLParameter({_S17_URL}, 'q')),
                      event_type != 'error'), 0) AS q_sum,
       groupBitOr(toInt64(user_id % 255)) AS bits,
       toInt64(SUM(dateDiff('day', toStartOfWeek(ts), ts)))
         AS days_into_week_sum,
       MIN(IPv4NumToString(toUInt32(3232235776 + user_id % 64))) AS min_ip,
       toInt64(SUM(arraySum(arrayMap(x -> toInt64(length(x)),
                                     extractAll(props, '[0-9]+')))))
         AS digitlen_sum
FROM events
GROUP BY month, shard_domain
ORDER BY month, shard_domain
"""

_S17_ORACLE = """
SELECT strftime(date_trunc('month', CAST(ts AS TIMESTAMP)), '%Y-%m') AS month,
       concat('sh', CAST(user_id % 5 AS VARCHAR), '.example.org')
         AS shard_domain,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(event_id % 97)
              FILTER (WHERE event_type != 'error'), 0) AS BIGINT) AS q_sum,
       CAST(bit_or(CAST(user_id % 255 AS BIGINT)) AS BIGINT) AS bits,
       CAST(SUM(date_diff('day',
              CAST(ts AS DATE)
                - CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS INT),
              CAST(ts AS TIMESTAMP))) AS BIGINT) AS days_into_week_sum,
       MIN(concat('192.168.1.', CAST(user_id % 64 AS VARCHAR))) AS min_ip,
       CAST(SUM(COALESCE(list_sum(list_transform(
              regexp_extract_all(props, '[0-9]+'),
              x -> CAST(length(x) AS BIGINT))), 0)) AS BIGINT)
         AS digitlen_sum
FROM events
GROUP BY month, shard_domain
ORDER BY month, shard_domain
"""


@register("s17_ch_dialect_tranche3", oracle=_S17_ORACLE, tier="T3")
def s17_ch_dialect_tranche3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tranche-3 CH-dialect surface in one statement: URL family
    (domain/extractURLParameter over a synthesized per-row URL, so
    Spark's parse_url round trip is checked against values DuckDB
    computes directly), boundary-semantics dateDiff from the
    Sunday-start toStartOfWeek, literal %-format formatDateTime,
    IPv4NumToString octet math, groupBitOr bit reduction, and
    arraySum/arrayMap numeric folds — all Catalyst-inlined (no Python).

    Scale: map-only expressions above one (month, shard) hash
    aggregate — identical shape to d1."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S17_CH_SQL)


_S18_CH_SQL = """
WITH toks AS (
  SELECT doc_id,
         arrayFilter(w -> length(w) >= 8, splitByChar(' ', text)) AS words
  FROM documents
), pairs AS (
  SELECT doc_id, words, arrayMap(w -> length(w), words) AS lens
  FROM toks
)
SELECT doc_id, w, toInt64(l) AS l
FROM pairs ARRAY JOIN words AS w, lens AS l
WHERE l >= 10
UNION ALL
SELECT doc_id, w, toInt64(-1) AS l
FROM toks LEFT ARRAY JOIN words AS w
WHERE w IS NULL
UNION ALL
SELECT doc_id, words AS w, toInt64(length(words)) - 100 AS l
FROM toks ARRAY JOIN words
WHERE length(words) = 8
ORDER BY doc_id, w, l
"""

_S18_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), w -> length(w) >= 8) AS words
  FROM documents
), pairs AS (
  SELECT doc_id, words, list_transform(words, w -> length(w)) AS lens
  FROM toks
), lock AS (
  SELECT doc_id, UNNEST(words) AS w, UNNEST(lens) AS l FROM pairs
)
SELECT doc_id, w, CAST(l AS BIGINT) AS l FROM lock WHERE l >= 10
UNION ALL
SELECT doc_id, NULL AS w, CAST(-1 AS BIGINT) AS l
FROM toks WHERE len(words) = 0
UNION ALL
SELECT doc_id, w, CAST(length(w) - 100 AS BIGINT) AS l
FROM lock WHERE length(w) = 8
ORDER BY doc_id, w, l
"""


@register("s18_ch_array_join", oracle=_S18_ORACLE, tier="T3")
def s18_ch_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``ARRAY JOIN`` as STATEMENT TEXT (round-9 verdict gap #3) —
    all three clause shapes in one statement, rewritten by the dialect
    layer onto the g21/g37 explode machinery instead of raising a
    Spark parse error:

    * lockstep multi-item ``ARRAY JOIN words AS w, lens AS l`` →
      inline subquery over ``explode(arrays_zip(...))`` (g37's shape);
    * ``LEFT ARRAY JOIN words AS w`` → spliced ``LATERAL VIEW OUTER
      explode`` keeping empty-array docs as NULL-element rows (g21);
    * bare ``ARRAY JOIN words`` → CH's replacement semantics: the
      element REPLACES the array column in scope, via ``* EXCEPT``.

    The DuckDB oracle restates each branch natively (lockstep
    multi-UNNEST, len()=0 for the LEFT branch, UNNEST replacement), so
    the whole surface is hash-green, not rows-only.

    Scale: every branch is a Generate (flatMap) over the document scan
    — map-side only, zero shuffles before the final presentation sort;
    the union is a plan-level concatenation of three narrow scans."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return ch_sql(spark, _S18_CH_SQL)


_S19_CH_SQL = """
SELECT user_id,
  windowFunnel(86400)(ts, event_type = 'view', event_type = 'click',
                      event_type = 'purchase') AS funnel_lvl,
  arrayStringConcat(arrayMap(x -> toString(x),
    retention(event_type = 'view', event_type = 'purchase',
              event_type = 'signup')), ',') AS ret,
  uniqExact(toStartOfFiveMinutes(CAST(ts AS TIMESTAMP))) AS n_slot5,
  uniqExact(timeSlot(CAST(ts AS TIMESTAMP))) AS n_slot30,
  uniqExact(toStartOfInterval(CAST(ts AS TIMESTAMP), INTERVAL 6 hour))
    AS n_slot6h,
  toInt64(SUM(locate('u', event_type))) AS loc_sum,
  toInt64(SUM(countMatches(props, '[0-9]'))) AS digit_sum,
  toInt64(SUM(countEqual(range(5), toInt64(length(event_type)) % 5)))
    AS rng_eq_sum,
  toInt64(SUM(toInt64(arrayDotProduct(
    array(toFloat64(event_id % 7), toFloat64(1)),
    array(toFloat64(2), toFloat64(3)))))) AS dot_sum,
  monthName(MIN(CAST(ts AS TIMESTAMP))) AS first_month
FROM events
GROUP BY user_id
ORDER BY user_id
"""

_S19_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         event_type, props, ts
  FROM events
),
l1 AS (SELECT DISTINCT user_id, t FROM e WHERE event_type = 'view'),
l2 AS (SELECT DISTINCT e.user_id, e.t, l1.t AS t0
       FROM e JOIN l1 ON e.user_id = l1.user_id AND e.t > l1.t
        AND e.t - l1.t <= 86400000000
       WHERE e.event_type = 'click'),
l3 AS (SELECT DISTINCT e.user_id
       FROM e JOIN l2 ON e.user_id = l2.user_id AND e.t > l2.t
        AND e.t - l2.t0 <= 86400000000
       WHERE e.event_type = 'purchase'),
l2u AS (SELECT DISTINCT user_id FROM l2),
agg AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_v,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p,
    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_s,
    COUNT(DISTINCT t // 300000000) AS n_slot5,
    COUNT(DISTINCT t // 1800000000) AS n_slot30,
    COUNT(DISTINCT t // 21600000000) AS n_slot6h,
    CAST(SUM(strpos(event_type, 'u')) AS BIGINT) AS loc_sum,
    CAST(SUM(length(regexp_extract_all(props, '[0-9]'))) AS BIGINT)
      AS digit_sum,
    CAST(COUNT(*) AS BIGINT) AS rng_eq_sum,
    CAST(SUM(2 * (event_id % 7) + 3) AS BIGINT) AS dot_sum,
    strftime(MIN(CAST(ts AS TIMESTAMP)), '%B') AS first_month
  FROM e GROUP BY user_id
)
SELECT a.user_id,
  CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
            WHEN l2u.user_id IS NOT NULL THEN 2
            WHEN a.has_v = 1 THEN 1 ELSE 0 END AS INT) AS funnel_lvl,
  array_to_string([CAST(a.has_v AS INT), CAST(a.has_v * a.has_p AS INT),
   CAST(a.has_v * a.has_s AS INT)], ',') AS ret,
  a.n_slot5, a.n_slot30, a.n_slot6h, a.loc_sum, a.digit_sum,
  a.rng_eq_sum, a.dot_sum, a.first_month
FROM agg a
LEFT JOIN l3 ON a.user_id = l3.user_id
LEFT JOIN l2u ON a.user_id = l2u.user_id
ORDER BY a.user_id
"""


@register("s19_ch_dialect_tranche4", oracle=_S19_ORACLE, tier="T3")
def s19_ch_dialect_tranche4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tranche-4 CH-dialect surface in one statement (round-9 verdict
    gap #4): ``windowFunnel(w)(ts, conds...)`` as a time-sorted
    collect_list fold (latest-chain-start dominance — strictly more
    window headroom, so the greedy fold is exact; the DuckDB oracle
    restates the semantics from first principles as EXISTS-chains over
    strict time inequalities, valid because the testdata has no
    duplicate (user_id, ts) pairs at any SF), ``retention`` as the
    max-IF product array, epoch-grid ``toStartOfFiveMinutes`` /
    ``timeSlot`` / ``toStartOfInterval``, MySQL-compat ``locate``
    (native needle-first builtin), ``countMatches``, ``countEqual`` +
    ``range``, ``arrayDotProduct`` (integer-valued doubles — exact),
    and full-name ``monthName``.

    Scale: the funnel fold is ONE hash aggregate whose per-group state
    is the user's event structs — bounded by per-user event count
    (dozens here; a 100 TB funnel with pathological per-user
    cardinality belongs in h6/h14's two-phase operator instead, which
    this translation cites). Everything else is map-side expressions
    over the same single aggregate — d1's shape."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S19_CH_SQL)


_S20_CH_SQL = """
SELECT coalesce(event_type, '<TOTAL>') AS etype, n, uniq_users, val_fp
FROM (
  SELECT event_type,
         count() AS n,
         uniqExact(user_id) AS uniq_users,
         toInt64(sum(floor(value * 10000))) AS val_fp
  FROM events PREWHERE value > 50
  GROUP BY event_type WITH TOTALS
)
ORDER BY etype
"""

_S20_ORACLE = """
SELECT COALESCE(event_type, '<TOTAL>') AS etype,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS uniq_users,
       CAST(SUM(FLOOR(value * 10000)) AS BIGINT) AS val_fp
FROM events
WHERE value > 50
GROUP BY GROUPING SETS ((event_type), ())
ORDER BY etype
"""


@register("s20_ch_with_totals", oracle=_S20_ORACLE, tier="T3")
def s20_ch_with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``GROUP BY ... WITH TOTALS`` as STATEMENT TEXT, composed with
    PREWHERE and taken from SUBQUERY depth (the rewrite is local to its
    clause, so nesting works): translated onto GROUPING SETS
    ((keys), ()) — the per-group rows plus the all-rows totals row.
    The outer coalesce shows the portability seam explicitly: ANSI
    grouping sets emit NULL totals keys where CH renders the column
    type's default; aggregate VALUES are identical. TOTALS+HAVING
    raises by contract (CH totals_mode ambiguity) — pinned in
    tests/test_chdialect.py.

    Scale: one hash aggregate with a 2-set Expand over the filtered
    scan — the same physical shape as d10_cube_sets; no joins, no
    windows."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S20_CH_SQL)


_S21_CH_SQL = """
SELECT event_type,
  arrayStringConcat(arrayMap(e -> concat(toString(e.key), ':',
      toString(toInt64(e.value))),
    map_entries(sumMap(array(user_id % 4), array(toInt64(1))))), ',')
    AS smap,
  toInt64(floor(entropy(user_id % 8) * 10000)) AS ent_fp,
  toInt64(floor(boundingRatio(toFloat64(event_id), floor(value * 100))
      * 1000)) AS br_fp,
  age('day', min(CAST(ts AS TIMESTAMP)), max(CAST(ts AS TIMESTAMP)))
    AS span_days,
  age('hour', min(CAST(ts AS TIMESTAMP)), max(CAST(ts AS TIMESTAMP)))
    AS span_hours,
  toInt64(sum(toInt64(floor(L2Distance(
      array(toFloat64(user_id % 9), toFloat64(event_id % 4)),
      array(toFloat64(1), toFloat64(5))) * 1000)))) AS l2_fp,
  toInt64(sum(toInt64(floor(cosineDistance(
      array(toFloat64(user_id % 9 + 1), toFloat64(event_id % 4 + 1)),
      array(toFloat64(2), toFloat64(3))) * 1000000)))) AS cosd_fp
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# DuckDB restatement: per-key counts as the sorted k:v string (the d19
# canonical-map idiom), native entropy() (log2 in both engines — the
# floor(x*1e4) grid absorbs cross-libm ulps at fixture scale),
# arg_max/arg_min for boundingRatio, complete-unit epoch math for age,
# and the SAME correctly-rounded IEEE sequence (exact integer inputs →
# sqrt → multiply/divide) for the distance columns.
_S21_ORACLE = """
WITH base AS (
  SELECT event_type, event_id, user_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
  FROM events
),
smap AS (
  SELECT event_type,
         string_agg(CAST(k AS VARCHAR) || ':' || CAST(cnt AS VARCHAR),
                    ',' ORDER BY k) AS smap
  FROM (SELECT event_type, user_id % 4 AS k, COUNT(*) AS cnt
        FROM base GROUP BY 1, 2) kv
  GROUP BY event_type
),
agg AS (
  SELECT event_type,
    CAST(FLOOR(entropy(user_id % 8) * 10000) AS BIGINT) AS ent_fp,
    CAST(FLOOR((arg_max(FLOOR(value * 100), CAST(event_id AS DOUBLE))
        - arg_min(FLOOR(value * 100), CAST(event_id AS DOUBLE)))
        / (CAST(MAX(CAST(event_id AS DOUBLE)) AS DOUBLE)
           - MIN(CAST(event_id AS DOUBLE))) * 1000) AS BIGINT) AS br_fp,
    CAST((MAX(t_us) - MIN(t_us)) // 86400000000 AS BIGINT) AS span_days,
    CAST((MAX(t_us) - MIN(t_us)) // 3600000000 AS BIGINT) AS span_hours,
    CAST(SUM(CAST(FLOOR(sqrt(
        (CAST(user_id % 9 AS DOUBLE) - 1) * (CAST(user_id % 9 AS DOUBLE) - 1)
      + (CAST(event_id % 4 AS DOUBLE) - 5) * (CAST(event_id % 4 AS DOUBLE) - 5)
      ) * 1000) AS BIGINT)) AS BIGINT) AS l2_fp,
    CAST(SUM(CAST(FLOOR((1.0 -
        (CAST(user_id % 9 + 1 AS DOUBLE) * 2
         + CAST(event_id % 4 + 1 AS DOUBLE) * 3)
        / (sqrt(CAST(user_id % 9 + 1 AS DOUBLE) * CAST(user_id % 9 + 1 AS DOUBLE)
                + CAST(event_id % 4 + 1 AS DOUBLE) * CAST(event_id % 4 + 1 AS DOUBLE))
           * sqrt(2.0 * 2.0 + 3.0 * 3.0))) * 1000000) AS BIGINT)) AS BIGINT)
      AS cosd_fp
  FROM base
  GROUP BY event_type
)
SELECT agg.event_type, smap.smap, ent_fp, br_fp, span_days, span_hours,
       l2_fp, cosd_fp
FROM agg JOIN smap ON agg.event_type = smap.event_type
ORDER BY agg.event_type
"""


@register("s21_ch_dialect_tranche5", oracle=_S21_ORACLE, tier="T3")
def s21_ch_dialect_tranche5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tranche-5 CH-dialect surface in one statement: ``sumMap`` (the
    Map-combinator family, surfaced as the canonical sorted k:v string
    so the hash covers keys AND values), ``entropy`` (log2 Shannon fold
    — DuckDB's native entropy() is the oracle), ``boundingRatio``
    (max_by/min_by slope), ``age`` in complete units (epoch math), and
    the vector-distance family ``L2Distance``/``cosineDistance`` on
    integer-valued double arrays (exact inputs → correctly-rounded
    IEEE sqrt/divide — bit-identical across engines, the s19
    arrayDotProduct precedent). minMap/maxMap and the remaining norms
    are pinned against explode-reference plans in tests/test_chdialect.

    deltaSum / exponentialMovingAverage / largestTriangleThreeBuckets /
    intervalLengthSum RAISE by contract: they are block-order-dependent
    in CH itself, so a silent translation could not be
    order-deterministic — the error names the explicit-order operators
    (e10/e4/h-family) instead.

    Scale: one hash aggregate; the sumMap/entropy folds carry
    bounded-cardinality per-group state (4 and 8 distinct values here);
    the distance columns are map-side scalar expressions."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S21_CH_SQL)


_S22_DDL = """
CREATE MATERIALIZED VIEW mv_priority TO agg_priority
ENGINE = AggregatingMergeTree() ORDER BY o_orderpriority
AS SELECT o_orderpriority,
          count() AS n_orders,
          sum(o_totalprice) AS sum_price,
          avg(o_totalprice) AS avg_price,
          min(o_totalprice) AS min_price,
          max(o_totalprice) AS max_price,
          uniqExact(o_custkey) AS n_cust,
          countIf(o_orderstatus = 'F') AS n_finished
   FROM orders
   WHERE o_orderpriority != 'P9'
   GROUP BY o_orderpriority
"""

_S22_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {o_dsum('o_totalprice')} AS sum_price,
       ({o_dsum('o_totalprice')}) / COUNT(*) AS avg_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
       CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
         AS n_finished
FROM orders
WHERE o_orderpriority != 'P9'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("s22_ch_create_mv", oracle=_S22_ORACLE)
def s22_ch_create_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``CREATE MATERIALIZED VIEW`` DDL as pasted TEXT, driven
    through a full replication cycle: the DDL parses into the k-family
    mergeable-partials discipline (functions/chmv.py), the view is
    POPULATEd from the pre-1997 base, then two delta batches (1997-98,
    1999+) apply as partial-merges — never recomputing the base — and
    ``read()`` finalizes. The oracle is a flat full-recompute over the
    same table, so the driver hash PROVES merge == recompute through
    the DDL front door, the same claim k1 makes for the hand-built
    state. count/sum/avg/min/max/uniqExact/countIf all exercise their
    own partial shapes (fixed-point sums, distinct sets, gated counts).

    Scale: identical to k1 — partials are map-side-combinable; a delta
    merge shuffles one row per (group, batch) regardless of fact size;
    uniqExact is the documented bounded-domain member."""
    from pyspark.sql import functions as SF

    from mysql_to_clickhouse_spark.functions.chmv import (
        create_materialized_view,
    )

    orders = load(spark, sf_dir, "orders")
    mv = create_materialized_view(spark, _S22_DDL)
    cut1 = SF.lit("1997-01-01").cast("timestamp")
    cut2 = SF.lit("1999-01-01").cast("timestamp")
    mv.initialize(orders.filter(SF.col("o_orderdate") < cut1))
    mv.apply_delta(
        orders.filter(
            (SF.col("o_orderdate") >= cut1) & (SF.col("o_orderdate") < cut2)
        )
    )
    mv.apply_delta(orders.filter(SF.col("o_orderdate") >= cut2))
    return mv.read().orderBy("o_orderpriority")


_S22B_DDL = """
CREATE MATERIALIZED VIEW mv_price_q TO agg_price_q
ENGINE = AggregatingMergeTree() ORDER BY o_orderpriority
AS SELECT o_orderpriority,
          count() AS n_orders,
          quantile(0.5)(o_totalprice) AS p50,
          quantile(0.9)(o_totalprice) AS p90
   FROM orders
   GROUP BY o_orderpriority
"""

# The d4b pattern for approximate state: the HASHED columns are the
# exact count plus rank-tolerance BOOLEANS (is the KLL estimate's
# exact rank within ±5 % of its target? — ~3x the DataSketches
# default-k bound, so a pass is meaningful and a sketch defect
# diverges the hash). The raw estimates are approximate on both
# engines and are deliberately NOT hashed.
_S22B_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       TRUE AS p50_in_tol,
       TRUE AS p90_in_tol
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("s22b_ch_mv_quantile_state", oracle=_S22B_ORACLE)
def s22b_ch_mv_quantile_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``quantileState``-family MV through the DDL front door
    (VERDICT r10 #6): ``quantile(p)(x)`` in CREATE MATERIALIZED VIEW
    parses into a MERGEABLE KLL sketch partial (kll_sketch_agg_double /
    kll_merge_agg_double — the quantileState/quantileMerge analog,
    O(1) state per group), and ``TO target`` is wired: every state
    transition writes through to the ``agg_price_q`` catalog table,
    from which a FRESHLY PARSED view ``attach()``es mid-cycle here —
    the replicator restart path, exercised inside the checked query.

    Hash contract (the d4b discipline for approximate state): exact
    per-group counts plus booleans asserting the merged sketch's p50/
    p90 estimates sit within ±5 % rank of their targets, checked
    against exact ``percentile`` rank windows computed on the same
    frame. The estimates themselves are approximate on both engines
    (CH quantile is reservoir-sampled) and are not hashed.

    Scale: partials are map-side-combinable sketches; a delta merge
    shuffles one ~1 KB sketch row per (group, batch) regardless of
    fact cardinality; the tolerance join is per-group (5 rows)."""
    from pyspark.sql import functions as SF

    from mysql_to_clickhouse_spark.functions.chmv import (
        create_materialized_view,
    )

    orders = load(spark, sf_dir, "orders")
    cut = SF.lit("1997-01-01").cast("timestamp")
    mv = create_materialized_view(spark, _S22B_DDL)
    mv.initialize(orders.filter(SF.col("o_orderdate") < cut))
    # restart: new parse of the same DDL, re-bound to the target table
    mv2 = create_materialized_view(spark, _S22B_DDL).attach()
    mv2.apply_delta(orders.filter(SF.col("o_orderdate") >= cut))
    est = mv2.read()

    windows = orders.groupBy("o_orderpriority").agg(
        SF.expr("percentile(o_totalprice, 0.45)").alias("lo50"),
        SF.expr("percentile(o_totalprice, 0.55)").alias("hi50"),
        SF.expr("percentile(o_totalprice, 0.85)").alias("lo90"),
        SF.expr("percentile(o_totalprice, 0.95)").alias("hi90"),
    )
    return (
        est.join(windows, "o_orderpriority")
        .select(
            "o_orderpriority",
            SF.col("n_orders").cast("long").alias("n_orders"),
            SF.col("p50").between(SF.col("lo50"), SF.col("hi50"))
            .alias("p50_in_tol"),
            SF.col("p90").between(SF.col("lo90"), SF.col("hi90"))
            .alias("p90_in_tol"),
        )
        .orderBy("o_orderpriority")
    )


_S23_UPDATE = """
ALTER TABLE events UPDATE value = value * 1.1, event_type = 'adjusted'
WHERE event_type = 'error' AND value > 100
"""

_S23_DELETE = """
ALTER TABLE events DELETE WHERE event_type = 'view' AND user_id % 10 = 3
"""

_S23_ORACLE = """
WITH mutated AS (
  SELECT event_id, user_id,
         CASE WHEN event_type = 'error' AND value > 100
              THEN value * 1.1 ELSE value END AS value,
         CASE WHEN event_type = 'error' AND value > 100
              THEN 'adjusted' ELSE event_type END AS event_type
  FROM events
),
survivors AS (
  SELECT * FROM mutated
  WHERE NOT COALESCE(event_type = 'view' AND user_id % 10 = 3, FALSE)
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT) AS val_fp
FROM survivors
GROUP BY event_type
ORDER BY event_type
"""


@register("s23_ch_mutations", oracle=_S23_ORACLE)
def s23_ch_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH lightweight-mutation statements as pasted TEXT
    (functions/chdialect.ch_mutation): an ``ALTER TABLE UPDATE``
    (conditional column rewrite — CASE WHEN under the mutation
    predicate, original dtype preserved) chained into an ``ALTER TABLE
    DELETE`` (survivors = NOT predicate, NULL-predicate rows kept —
    CH deletes only where the predicate is TRUE), then a digest
    aggregate so the hash covers every surviving row's mutated values.
    The oracle restates both mutations as one CASE/WHERE pipeline.

    Scale: a CH mutation rewrites parts in the background; here the
    returned plan IS the post-mutation view — one scan, two map-side
    expressions, no shuffle before the digest aggregate. Writing it
    back through the a5 sink is the same rewrite CH schedules."""
    from pyspark.sql import functions as F

    from mysql_to_clickhouse_spark.functions.chdialect import ch_mutation
    from mysql_to_clickhouse_spark.functions.numeric import fixed_point

    ev = load(spark, sf_dir, "events")
    mutated = ch_mutation(_S23_UPDATE, ev)
    survivors = ch_mutation(_S23_DELETE, mutated)
    return (
        survivors.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(fixed_point("value")).alias("val_fp"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# s24 — CH dialect tranche 7 in one statement
# ---------------------------------------------------------------------------

_S24_CH_SQL = """
SELECT event_type,
  sum(toInt64OrZero(simpleJSONExtractString(props, 'k'))) AS k_sum,
  sumDistinct(toInt64(user_id % 16)) AS sd,
  min(toInt32OrNull(concat('1', toString(event_id % 100)))) AS parse_min,
  countIf(isValidJSON(props)) AS n_json,
  countIf(isValidJSON(concat('{', props))) AS n_badjson,
  hex(MD5(event_type)) AS md5_hex,
  hex(SHA256(event_type)) AS sha_hex,
  toTypeName(event_type) AS ty,
  multiSearchFirstIndex(event_type, ['iew', 'lick', 'rror']) AS msfi,
  arrayFirstIndex(v -> v > 2, [toInt64(1), toInt64(2), toInt64(5)]) AS afi,
  max(bitTest(toInt64(user_id), 0)) AS bt,
  sum(moduloOrZero(toInt64(user_id), toInt64(event_id % 3))) AS mz,
  toString(toDecimal64('123.456', 2)) AS dec_s,
  replaceOne(event_type, 'e', 'E') AS rep,
  positionCaseInsensitive(event_type, 'IC') AS pci,
  toString(toDate(parseDateTimeBestEffort('31/12/2019 10:00:00'))) AS pd,
  toString(toDate(toDateTime('2020-01-31 00:00:00') + toIntervalMonth(1)))
    AS nxt,
  accurateCastOrNull('12', 'Int32') AS acc
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# DuckDB restatement: regexp for the flat-JSON key (no json extension
# dependency), SUM(DISTINCT), non-global regexp_replace ==
# replace-first, md5/sha256 lowercase-hex uppercased, CASE ladder for
# multiSearchFirstIndex, constants folded where the CH side computes a
# constant expression (afi/dec_s/pd/nxt/acc/ty).
_S24_ORACLE = """
SELECT event_type,
  CAST(SUM(COALESCE(TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1)
      AS BIGINT), 0)) AS BIGINT) AS k_sum,
  CAST(SUM(DISTINCT CAST(user_id % 16 AS BIGINT)) AS BIGINT) AS sd,
  MIN(TRY_CAST('1' || CAST(event_id % 100 AS VARCHAR) AS INT))
    AS parse_min,
  COUNT(*) AS n_json,
  CAST(0 AS BIGINT) AS n_badjson,
  upper(md5(event_type)) AS md5_hex,
  upper(sha256(event_type)) AS sha_hex,
  'string' AS ty,
  CAST(CASE WHEN strpos(event_type, 'iew') > 0 THEN 1
            WHEN strpos(event_type, 'lick') > 0 THEN 2
            WHEN strpos(event_type, 'rror') > 0 THEN 3
            ELSE 0 END AS INT) AS msfi,
  CAST(3 AS INT) AS afi,
  MAX(CAST(user_id % 2 AS TINYINT)) AS bt,
  CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 0
           ELSE CAST(user_id AS BIGINT) % (event_id % 3) END)
    AS BIGINT) AS mz,
  '123.46' AS dec_s,
  regexp_replace(event_type, 'e', 'E') AS rep,
  CAST(strpos(lower(event_type), 'ic') AS INT) AS pci,
  '2019-12-31' AS pd,
  '2020-02-29' AS nxt,
  CAST(12 AS INT) AS acc
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("s24_ch_dialect_tranche7", oracle=_S24_ORACLE, tier="T3")
def s24_ch_dialect_tranche7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tranche-7 CH-dialect surface in one pasted statement: the
    parse-or-null/or-zero cast family (``toInt64OrZero``,
    ``toInt32OrNull`` — the string-parse replication use case), flat
    JSON (``simpleJSONExtractString`` with CH's ''-on-missing contract,
    ``isValidJSON`` on both valid and corrupted input), the binary
    crypto hashes (``hex(MD5(..))``/``hex(SHA256(..))`` — custom text
    forms because the names collide with Spark builtins of different
    return type), ``sumDistinct``, ``multiSearchFirstIndex`` /
    ``arrayFirstIndex`` (1-based, 0 when absent), ``bitTest``,
    ``moduloOrZero`` (zero divisor → 0, the OrZero family's arithmetic
    twin), ``toDecimal64`` (scale literal → DECIMAL(18, s)),
    ``replaceOne`` (replace-FIRST — DuckDB's non-global regexp_replace
    is the oracle), ``positionCaseInsensitive``,
    ``parseDateTimeBestEffort`` (day-first slash form),
    ``toIntervalMonth`` calendar arithmetic, and
    ``accurateCastOrNull`` with a literal CH type name.

    dictGet/arrayReduce/blockNumber/anyHeavy RAISE with guidance by
    contract (runtime dictionary/block introspection has no
    deterministic distributed analog) — pinned in tests/test_chdialect.

    Scale: one hash aggregate over events; every tranche-7 call is an
    inlined scalar expression (SQL UDF bodies inline into codegen —
    the registration-cost test pins this), so the plan is identical to
    hand-written builtin text."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return ch_sql(spark, _S24_CH_SQL)


# ---------------------------------------------------------------------------
# s25 — CH CREATE DICTIONARY + the dictGet family
# ---------------------------------------------------------------------------

_S25_DDL = """
CREATE DICTIONARY nation_dict (
    n_nationkey Int64,
    n_name String,
    n_regionkey Int64
)
PRIMARY KEY n_nationkey
SOURCE(CLICKHOUSE(TABLE 'nation'))
LIFETIME(600)
LAYOUT(HASHED())
"""

_S25_CH_SQL = """
SELECT dictGetString('nation_dict', 'n_name', s_nationkey) AS nat,
       count() AS n_supp,
       sum(toInt64(dictGet('nation_dict', 'n_regionkey',
                           s_nationkey))) AS region_mass,
       countIf(dictHas('nation_dict', s_nationkey)) AS n_known,
       countIf(dictHas('nation_dict', s_nationkey + 1000)) AS n_unknown,
       min(dictGetOrDefault('nation_dict', 'n_name', s_nationkey + 1000,
                            'none')) AS missing_default,
       min(dictGet('nation_dict', 'n_name', s_nationkey + 1000))
         AS missing_zero
FROM supplier
GROUP BY nat
ORDER BY nat
"""

_S25_ORACLE = """
SELECT n.n_name AS nat,
       COUNT(*) AS n_supp,
       CAST(SUM(n.n_regionkey) AS BIGINT) AS region_mass,
       COUNT(*) AS n_known,
       CAST(0 AS BIGINT) AS n_unknown,
       'none' AS missing_default,
       '' AS missing_zero
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nat
"""


@register("s25_ch_dictionary", oracle=_S25_ORACLE, tier="T3")
def s25_ch_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH external dictionaries end-to-end as pasted TEXT: the
    ``CREATE DICTIONARY`` DDL (functions/chdict) registers nation as
    an inlined-literal-map lookup, then one statement exercises
    ``dictGetString`` (typed get), ``dictGet`` with the CH
    zero-default on a guaranteed-missing key ('' for String — CH
    returns the attribute default, never NULL), ``dictGetOrDefault``
    with a per-call fallback, and ``dictHas`` on both present and
    absent keys. The oracle restates the lookups as the plain
    dimension join they replace.

    Scale design: a CH dictionary IS a broadcast hash map; here the
    (bounded, MAX_CELLS-capped) dimension folds into the expression
    layer as a literal map — zero joins scheduled, works in any
    clause. Past the cap registration raises naming the broadcast
    dimension join (tables.load_dim) — the same size-dispatch
    discipline as plans/dispatch.py, pinned in tests/test_chdict."""
    from mysql_to_clickhouse_spark.functions.chdict import (
        register_dictionary,
    )

    register_dictionary(spark, _S25_DDL, load(spark, sf_dir, "nation"))
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return ch_sql(spark, _S25_CH_SQL)


# ---------------------------------------------------------------------------
# s26 — CH query parameters {name:Type}
# ---------------------------------------------------------------------------

_S26_CH_SQL = """
SELECT o_orderpriority,
       count() AS n,
       sum(toInt64(o_totalprice > {cutoff:Float64})) AS n_big,
       min({col:Identifier}) AS first_status
FROM orders
WHERE has({statuses:Array(String)}, o_orderstatus)
  AND o_orderdate >= {since:DateTime}
  AND o_custkey % {buckets:UInt32} = {pick:UInt32}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_S26_PARAMS = {
    "cutoff": 150000.0,
    "col": "o_orderstatus",
    "statuses": ["F", "O"],
    "since": "1996-01-01 00:00:00",
    "buckets": 7,
    "pick": 3,
    # deliberately unused: one dict may serve many statements (the CH
    # param_* contract — extras are ignored, absences raise)
    "extra_unused": "ignored",
}

_S26_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice > 150000.0 AS BIGINT)) AS BIGINT)
         AS n_big,
       MIN(o_orderstatus) AS first_status
FROM orders
WHERE o_orderstatus IN ('F', 'O')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_custkey % 7 = 3
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("s26_ch_query_params", oracle=_S26_ORACLE, tier="T3")
def s26_ch_query_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH query parameters as pasted TEXT: ``{name:Type}`` placeholders
    bound client-side to TYPED literals (chdialect.bind_params — the
    substitution CH clients perform via param_<name>), covering
    Float64/UInt32 scalars, DateTime, Array(String) consumed through
    ``has``, and an ``{col:Identifier}`` column reference (validated,
    emitted as a backtick identifier — never raw splicing). Extra dict
    entries are ignored (one dict, many statements); a missing binding
    or a non-identifier value raises with the placeholder named —
    pinned in tests/test_chdialect.

    Scale: binding is pure text; the bound plan is byte-identical to
    hand-written literals, so pruning/pushdown see constants, exactly
    like CH's server-side substitution."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return ch_sql(spark, _S26_CH_SQL, params=_S26_PARAMS)
