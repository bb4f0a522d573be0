"""§2.E — window functions (ranking, offsets, running/sliding frames).

Determinism: every window ORDER BY ends in a unique key (PK tie-break),
and cumulative/sliding sums of doubles go through fixed-point bigints —
window sum implementations (segment trees vs streaming) are free to
re-associate additions, which diverges in ulps on doubles but is exact
on integers.

Scale: a window's partitionBy key is its shuffle key. Everything here
partitions by a high-cardinality key (customer, user) — never a global
window over raw facts. The one global window (daily series) runs over
an already-aggregated frame of |days| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import fixed_point, o_fixed_point
from mysql_to_clickhouse_spark.plans.prefix import global_row_number, running_sums
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load, load_clustered

# ---------------------------------------------------------------------------
# e1_row_number — ranking trio, top-3 orders per customer
# ---------------------------------------------------------------------------

_E1_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
         CAST(RANK() OVER w AS BIGINT) AS rk,
         CAST(DENSE_RANK() OVER w AS BIGINT) AS drk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT * FROM ranked WHERE rn <= 3
ORDER BY o_custkey, rn
"""


@register("e1_row_number", oracle=_E1_ORACLE, tier="T1")
def e1_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank: top-3 orders per customer.
    One shuffle on o_custkey; the filter keeps ≤3 rows per key —
    Spark plans a partial WindowGroupLimit BELOW the exchange, so at
    most 3 rows per (key, map partition) ship. When the session routes
    an o_custkey projection (tables.ensure_projection — the CH
    PROJECTION analog), even that exchange disappears: the scan itself
    carries HashPartitioning(o_custkey)."""
    orders = load_clustered(spark, sf_dir, "orders", "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rk"),
            F.dense_rank().over(w).cast("long").alias("drk"),
        )
        .filter(F.col("rn") <= 3)
        
    )


# ---------------------------------------------------------------------------
# e2_lag_lead — offset access: inter-event gaps per user
# ---------------------------------------------------------------------------

_E2_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w AS prev_us,
         LEAD(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w AS next_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
)
SELECT user_id, event_id, ts_us,
       COALESCE(prev_us, -1) AS prev_us,
       COALESCE(next_us, -1) AS next_us,
       COALESCE(ts_us - prev_us, -1) AS gap_us
FROM seq
ORDER BY user_id, ts_us, event_id
"""


@register("e2_lag_lead", oracle=_E2_ORACLE)
def e2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead by one event within each user's timeline; gap between
    consecutive events. Edge rows surface sentinel -1 (NULL policy)."""
    ev = load(spark, sf_dir, "events")
    seq = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        seq.select(
            "user_id",
            "event_id",
            "ts_us",
            F.lag("ts_us", 1).over(w).alias("prev_us"),
            F.lead("ts_us", 1).over(w).alias("next_us"),
        )
        .select(
            "user_id",
            "event_id",
            "ts_us",
            F.coalesce("prev_us", F.lit(-1)).alias("prev_us"),
            F.coalesce("next_us", F.lit(-1)).alias("next_us"),
            F.coalesce(F.col("ts_us") - F.col("prev_us"), F.lit(-1)).alias("gap_us"),
        )
        
    )


# ---------------------------------------------------------------------------
# e3_running_sum — cumulative revenue per customer
# ---------------------------------------------------------------------------

_E3_ORACLE = f"""
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(SUM({o_fixed_point('o_totalprice')}) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 10000.0 AS running_spend
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@register("e3_running_sum", oracle=_E3_ORACLE)
def e3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum frame (UNBOUNDED PRECEDING → CURRENT ROW).
    Fixed-point keeps the running total exact under any evaluation
    strategy (streaming vs segment tree)."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            (F.sum(fixed_point("o_totalprice")).over(w).cast("double") / 10000.0).alias(
                "running_spend"
            ),
        )
        
    )


# ---------------------------------------------------------------------------
# e4_moving_avg — 7-row moving average over the daily event series
# ---------------------------------------------------------------------------

_E4_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(SUM({o_fixed_point('value')}) AS DOUBLE) / 10000.0 AS day_total
  FROM events GROUP BY day
), win AS (
  SELECT day, day_total,
         CAST(SUM(CAST(FLOOR(day_total * 10000.0) AS BIGINT)) OVER w AS DOUBLE)
           / 10000.0 AS win_sum,
         CAST(COUNT(*) OVER w AS BIGINT) AS win_n
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, day_total, win_sum / win_n AS ma7
FROM win
ORDER BY day
"""


@register("e4_moving_avg", oracle=_E4_ORACLE)
def e4_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row sliding mean over the daily totals series.

    The global window is safe: it runs over |days| pre-aggregated rows,
    not raw events — aggregate first, window second is the pattern that
    scales."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        (F.sum(fixed_point("value")).cast("double") / 10000.0).alias("day_total")
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    win = daily.select(
        "day",
        "day_total",
        (F.sum(fixed_point("day_total")).over(w).cast("double") / 10000.0).alias(
            "win_sum"
        ),
        F.count(F.lit(1)).over(w).cast("long").alias("win_n"),
    )
    return win.select(
        "day", "day_total", (F.col("win_sum") / F.col("win_n")).alias("ma7")
    )


# ---------------------------------------------------------------------------
# e5_range_frame — RANGE frame over a numeric ordering
# ---------------------------------------------------------------------------

_E5_ORACLE = f"""
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_band,
       CAST(SUM({o_fixed_point('o_totalprice')}) OVER w AS DOUBLE) / 10000.0
         AS band_sum
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_totalprice
  RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW
)
ORDER BY o_custkey, o_totalprice, o_orderkey
"""


@register("e5_range_frame", oracle=_E5_ORACLE, tier="T3")
def e5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: orders within 10k price below each
    order, per customer. RANGE frames include peers — well-defined even
    with ties, so no tie-break is needed inside the frame itself."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.count(F.lit(1)).over(w).cast("long").alias("n_in_band"),
            (F.sum(fixed_point("o_totalprice")).over(w).cast("double") / 10000.0).alias(
                "band_sum"
            ),
        )
        
    )


# ---------------------------------------------------------------------------
# e6_ntile_pct — distribution functions
# ---------------------------------------------------------------------------

_E6_ORACLE = """
SELECT c_custkey, c_acctbal,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
ORDER BY c_acctbal, c_custkey
"""


@register("e6_ntile_pct", oracle=_E6_ORACLE)
def e6_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over a unique total order (PK
    tie-break makes peer groups singletons → both engines agree).

    Scale: with singleton peers all three distribution functions are
    PURE ARITHMETIC over (global position i, total rows N):
    percent_rank = (i−1)/(N−1), cume_dist = i/N, and ntile(4) assigns
    the first N mod 4 buckets ⌈N/4⌉ rows (the ANSI fill rule both
    engines implement). The position comes from the two-phase parallel
    prefix scan (plans/prefix.py), so the plan has NO single-partition
    WindowExec — the old ``Window.orderBy(...)`` form sorted every
    customer row into one task; this one range-partitions the sort and
    broadcasts 32 offset rows."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked, n = global_row_number(
        cust, ["c_acctbal", "c_custkey"], out_col="i"
    )
    q, r = divmod(n, 4)
    if q == 0:  # fewer rows than buckets: bucket == position
        quartile = F.col("i")
    else:
        # first r buckets take q+1 rows, the rest q — integer DIV only
        quartile = F.when(
            F.col("i") <= r * (q + 1),
            F.expr(f"(i + {q}) DIV {q + 1}"),
        ).otherwise(F.expr(f"{r} + (i - {r * (q + 1)} + {q - 1}) DIV {q}"))
    pct_rank = (
        ((F.col("i") - 1) / F.lit(n - 1)) if n > 1 else F.lit(0.0)
    )
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        quartile.cast("long").alias("quartile"),
        pct_rank.alias("pct_rank"),
        (F.col("i") / F.lit(n)).alias("cume"),
    )


# ---------------------------------------------------------------------------
# e7_first_last — first/last value in frame
# ---------------------------------------------------------------------------

_E7_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       FIRST_VALUE(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS first_price,
       LAST_VALUE(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
       ) AS latest_price
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@register("e7_first_last", oracle=_E7_ORACLE)
def e7_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value (earliest order price) and last_value (latest order
    price) per customer, with explicit frames on a unique ordering."""
    orders = load(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_first = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # last() over [currentRow, unboundedFollowing] is the value at the
    # partition's final row — identical for EVERY frame suffix — but
    # Spark re-evaluates unbounded-FOLLOWING frames per row (O(rows²)
    # per key). The whole-partition frame returns the same value and is
    # computed once per partition (UnboundedWindowFunctionFrame, O(rows)).
    # (Only valid for plain last(); an ignorenulls variant would differ.)
    w_last = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.first("o_totalprice").over(w_first).alias("first_price"),
            F.last("o_totalprice").over(w_last).alias("latest_price"),
        )
        
    )


# ---------------------------------------------------------------------------
# e8_window_distinct — running distinct count over a window
# ---------------------------------------------------------------------------

_E8_ORACLE = """
SELECT user_id, event_id,
       epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       event_type,
       CAST(COUNT(DISTINCT event_type) OVER w AS BIGINT) AS distinct_types_so_far
FROM events
WINDOW w AS (
  PARTITION BY user_id
  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
ORDER BY user_id, ts_us, event_id
"""


@register("e8_window_distinct", oracle=_E8_ORACLE, tier="T3")
def e8_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count per user (how many distinct event types
    so far) — an aggregate Spark windows do NOT support natively
    (`count(distinct) over` is rejected), emulated exactly as
    size(collect_set() over running-frame).

    Scale note: the collected set is bounded by event-type cardinality
    (small domain), so per-row state stays O(|types|); do NOT use this
    pattern over unbounded-cardinality columns — that's a sketch's job
    (d4's HLL merged per frame)."""
    ev = load(spark, sf_dir, "events")
    seq = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seq.select(
        "user_id",
        "event_id",
        "ts_us",
        "event_type",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("distinct_types_so_far"),
    )


# ---------------------------------------------------------------------------
# e9_running_distinct — cumulative distinct users per type over days
# ---------------------------------------------------------------------------

# Running COUNT(DISTINCT) has no direct window form on either engine at
# scale; the scalable identity: a user contributes on their FIRST day
# only → running distinct = running sum of first-seen flags.
_E9_ORACLE = """
WITH user_first AS (
  SELECT event_type, user_id,
         MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_day
  FROM events
  GROUP BY event_type, user_id
), daily_new AS (
  SELECT event_type, first_day AS day,
         CAST(COUNT(*) AS BIGINT) AS new_users
  FROM user_first
  GROUP BY event_type, first_day
)
SELECT event_type, CAST(day AS VARCHAR) AS day_str, new_users,
       CAST(SUM(new_users) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_distinct_users
FROM daily_new
ORDER BY event_type, day_str
"""


@register("e9_running_distinct", oracle=_E9_ORACLE)
def e9_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event_type by day — the growth
    curve. The naive form (COUNT(DISTINCT) OVER an expanding frame)
    rescans per row; the scalable identity is first-seen-flag + running
    sum: one (type, user) aggregate collapses the fact table, then the
    window runs over |types|·|days| rows. At 100 TB the heavy step is a
    map-side-combinable min — no O(n²) frame, no distinct-state
    window."""
    ev = load(spark, sf_dir, "events")
    user_first = (
        ev.select("event_type", "user_id", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "user_id")
        .agg(F.min("day").alias("first_day"))
    )
    daily_new = user_first.groupBy("event_type", "first_day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily_new.select(
        "event_type",
        F.col("first_day").cast("string").alias("day_str"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_distinct_users"),
    )


# ---------------------------------------------------------------------------
# e10_nonneg_derivative — CH nonNegativeDerivative(v, t): per-second rate
# ---------------------------------------------------------------------------

_E10_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         LAG(value) OVER w AS prev_v,
         LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_us
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
)
SELECT user_id, event_id, ts_us,
       CASE
         WHEN prev_us IS NULL OR ts_us = prev_us THEN NULL
         WHEN value < prev_v THEN 0.0
         ELSE (value - prev_v)
              / (CAST(ts_us - prev_us AS DOUBLE) / 1000000.0)
       END AS rate_per_s
FROM seq
ORDER BY user_id, ts_us, event_id
"""


@register("e10_nonneg_derivative", oracle=_E10_ORACLE)
def e10_nonneg_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``nonNegativeDerivative(value, ts)``: per-user per-second
    rate of change, clamped at zero on decreases (the counter-reset
    idiom of monitoring pipelines); NULL for the first point and for
    zero time deltas. The subtraction is on exact integer µs; the one
    division per row is fixed-order IEEE — hash-safe with no rounding.

    Scale: one lag window partitioned by the natural key — a single
    shuffle, no Python."""
    from mysql_to_clickhouse_spark.functions.numeric import epoch_us

    ev = load(spark, sf_dir, "events")
    ts_us = epoch_us("ts")
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "value",
        ts_us.alias("ts_us"),
        F.lag("value").over(w).alias("prev_v"),
        F.lag(ts_us).over(w).alias("prev_us"),
    )
    rate = (
        F.when(F.col("prev_us").isNull() | (F.col("ts_us") == F.col("prev_us")), None)
        .when(F.col("value") < F.col("prev_v"), F.lit(0.0))
        .otherwise(
            (F.col("value") - F.col("prev_v"))
            / ((F.col("ts_us") - F.col("prev_us")).cast("double") / 1000000.0)
        )
    )
    return seq.select("user_id", "event_id", "ts_us", rate.alias("rate_per_s"))


# ---------------------------------------------------------------------------
# e11_interpolate — CH WITH FILL ... INTERPOLATE (linear)
# ---------------------------------------------------------------------------

# Hourly grid per user between first and last activity; missing hours
# get linearly interpolated values between the neighboring real points.
# All inputs to the interpolation arithmetic are exact (integer hour
# indexes, fixed 2-decimal values), and the expression order is shared.
_E11_ORACLE = """
WITH pts AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
         MAX(value) AS v
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id, hr
), spine AS (
  SELECT p.user_id, g.hr
  FROM (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1
        FROM pts GROUP BY user_id) p,
       LATERAL (SELECT unnest(range(p.h0, p.h1 + 1)) AS hr) g
), joined AS (
  SELECT s.user_id, s.hr, p.v,
         CAST(s.hr AS DOUBLE) AS x
  FROM spine s LEFT JOIN pts p ON p.user_id = s.user_id AND p.hr = s.hr
), walls AS (
  SELECT user_id, hr, v, x,
         MAX(CASE WHEN v IS NOT NULL THEN x END) OVER (
           PARTITION BY user_id ORDER BY hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x0,
         MIN(CASE WHEN v IS NOT NULL THEN x END) OVER (
           PARTITION BY user_id ORDER BY hr
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS x1,
         LAST_VALUE(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
         FIRST_VALUE(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hr
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1
  FROM joined
)
SELECT user_id, CAST(hr AS BIGINT) AS hr,
       CAST(CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS BIGINT)
         AS interpolated,
       CASE WHEN v IS NOT NULL THEN v
            ELSE v0 + (v1 - v0) * (x - x0) / (x1 - x0) END AS value_filled
FROM walls
ORDER BY user_id, hr
"""


@register("e11_interpolate", oracle=_E11_ORACLE, tier="T2")
def e11_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``WITH FILL ... INTERPOLATE``: densify each user's purchase
    series to an hourly grid and LINEARLY interpolate the gaps between
    neighboring real points (h12 fills with constants; this is the
    value-interpolating variant every monitoring UI wants). Neighbor
    lookup is last/first_value IGNORE NULLS over the dense spine; the
    interpolation arithmetic runs in one shared expression order on
    exact inputs.

    Scale: the spine explodes ≤ activity-span hours per user (bounded
    sequence Generate, proportional to the report, not the facts); two
    window passes over the spine partitioned by user — one shuffle. The
    grid never touches the raw fact table beyond the first
    aggregate."""
    ev = load(spark, sf_dir, "events")
    pts = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("hr"),
            "value",
        )
        .groupBy("user_id", "hr")
        .agg(F.max("value").alias("v"))
    )
    span = pts.groupBy("user_id").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr"),
    )
    joined = spine.join(pts, ["user_id", "hr"], "left").select(
        "user_id", "hr", "v", F.col("hr").cast("double").alias("x")
    )
    back = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # Forward-looking walls via a REVERSED-order running frame, not a
    # [currentRow, unboundedFollowing] frame: Spark re-evaluates an
    # unbounded-FOLLOWING aggregate frame from scratch for every row
    # (UnboundedFollowingWindowFunctionFrame), making the wall pass
    # O(rows²) per user — measured 1.06 s warm at sf0.01 (92 k spine
    # rows) and unboundedly worse with span length. Over hr DESC the
    # same row set [current..end] is the RUNNING frame, which Spark
    # maintains incrementally: min == min (set function) and the last
    # non-null scanning hr-desc IS the first non-null scanning hr-asc,
    # so x1/v1 are value-identical (oracle re-proven). 1.06 s → 0.10 s,
    # same single exchange (one extra in-partition sort).
    fwd_rev = Window.partitionBy("user_id").orderBy(F.desc("hr")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    real_x = F.when(F.col("v").isNotNull(), F.col("x"))
    walls = joined.select(
        "user_id",
        "hr",
        "v",
        "x",
        F.max(real_x).over(back).alias("x0"),
        F.min(real_x).over(fwd_rev).alias("x1"),
        F.last("v", ignorenulls=True).over(back).alias("v0"),
        F.last("v", ignorenulls=True).over(fwd_rev).alias("v1"),
    )
    interp = F.col("v0") + (F.col("v1") - F.col("v0")) * (
        F.col("x") - F.col("x0")
    ) / (F.col("x1") - F.col("x0"))
    return walls.select(
        "user_id",
        F.col("hr").cast("long").alias("hr"),
        F.when(F.col("v").isNotNull(), 0).otherwise(1).cast("long").alias(
            "interpolated"
        ),
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp).alias(
            "value_filled"
        ),
    )


# ---------------------------------------------------------------------------
# e12_running_concurrency — CH runningConcurrency: open sessions per event
# ---------------------------------------------------------------------------

# Sessions = [ts, ts + 30 min) per event; concurrency at a start = open
# intervals at that instant. Same +1/-1 sweep as d27, but emitted per
# start event instead of folded to the max.
_E12_ORACLE = """
WITH iv AS (
  SELECT event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
  FROM events WHERE event_type = 'view'
), pts AS (
  SELECT event_id, s AS t, 1 AS delta, 0 AS is_end FROM iv
  UNION ALL
  SELECT event_id, e AS t, -1 AS delta, 1 AS is_end FROM iv
), swept AS (
  SELECT event_id, t, delta, is_end,
         CAST(SUM(delta) OVER (
           ORDER BY t, is_end, delta DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS open_now
  FROM pts
)
SELECT event_id, t AS ts_us, open_now AS concurrency
FROM swept
WHERE is_end = 0
ORDER BY event_id
"""


@register("e12_running_concurrency", oracle=_E12_ORACLE, tier="T3")
def e12_running_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``runningConcurrency(begin, end)``: for every session start,
    how many sessions are open at that instant (30-min sessions from
    view events). The d27 sweep-line emitted per start event: union the
    ±1 endpoints, one ordered running sum, keep the starts. Ends sort
    before starts at equal timestamps (half-open intervals), matching
    d27's tie order.

    Scale: 2× row union + the two-phase parallel prefix sum
    (plans/prefix.py) for the global sweep order — range-partitioned
    endpoints, per-partition local running sums, 32 broadcast offset
    rows. The CH-semantics GLOBAL order costs a parallel range sort,
    not a single-partition WindowExec; per-user/shard variants just
    add the partition key."""
    ev = load(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "view").select(
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 1800000000).alias("e"),
    )
    starts = iv.select(
        "event_id", F.col("s").alias("t"), F.lit(1).alias("delta"),
        F.lit(0).alias("is_end"),
    )
    ends = iv.select(
        "event_id", F.col("e").alias("t"), F.lit(-1).alias("delta"),
        F.lit(1).alias("is_end"),
    )
    pts = starts.unionByName(ends)
    # delta is a function of is_end, so (t, is_end, event_id) states the
    # oracle's (t, is_end, delta DESC, event_id) order exactly
    swept, _ = running_sums(
        pts, ["t", "is_end", "event_id"], {"open_now": F.col("delta")}
    )
    return (
        swept.filter(F.col("is_end") == 0)
        .select(
            "event_id", F.col("t").alias("ts_us"),
            F.col("open_now").alias("concurrency"),
        )
    )
