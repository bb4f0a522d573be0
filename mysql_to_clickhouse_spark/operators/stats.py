"""§2.D extensions — ClickHouse statistical/behavioral aggregate analogs.

The CH surface this module covers: ``retention()`` (cohort funnels),
``histogram()`` (fixed-bin variant), ``entropy()``, ``avgWeighted()``,
``simpleLinearRegression()``, ``cramersV()``, and
``exponentialTimeDecayedAvg()``. Category grounding: these are the
behavioral-analytics aggregates ClickHouse ships for exactly the
replicated-events tables a MySQL→ClickHouse pipeline feeds (SURVEY.md
§0 `[analog]`; the reference checkout is empty, so no file:line
citation is possible — driver contract per SURVEY §0).

Determinism design (SURVEY.md §5.4): every float reduction goes through
``functions.numeric.dsum`` (fixed-point bigint, order-independent);
transcendentals (LN/EXP) are rounded immediately after evaluation (the
i6 tf-idf precedent) because libm log/exp are not correctly-rounded;
sqrt IS correctly-rounded and used bare (d31 precedent). Post-aggregate
arithmetic is stated once as a shared SQL fragment evaluated by BOTH
engines in identical operation order.

Scale notes per operator in the docstrings; the common shape is ONE
scan → map-side-combinable hash aggregate → scalar/small-group
arithmetic, i.e. a fold — no joins on the fact path, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import (
    dsum,
    dsum_wide,
    o_dsum,
    o_dsum_wide,
    epoch_us,
    o_epoch_us,
    fixed_point,
)
from mysql_to_clickhouse_spark.plans.prefix import running_sums
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

# ---------------------------------------------------------------------------
# d35_retention — CH retention(cond1, ..., condN): cohort re-activity
# ---------------------------------------------------------------------------

# Cohort = active in the first 4 days; retained windows = week-1 and
# week-2 revisit windows. CH semantics: r[0] = cond1; r[i] = cond1 AND
# cond_i — later flags are gated on cohort membership.
_D35_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN ts <  TIMESTAMP '2024-01-05' THEN 1 ELSE 0 END) AS c1,
         MAX(CASE WHEN ts >= TIMESTAMP '2024-01-08'
                   AND ts < TIMESTAMP '2024-01-12' THEN 1 ELSE 0 END) AS c2,
         MAX(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                   AND ts < TIMESTAMP '2024-01-19' THEN 1 ELSE 0 END) AS c3
  FROM events
  GROUP BY user_id
)
SELECT CAST(SUM(c1) AS BIGINT)      AS cohort,
       CAST(SUM(c1 * c2) AS BIGINT) AS retained_w1,
       CAST(SUM(c1 * c3) AS BIGINT) AS retained_w2,
       CAST(COUNT(*) AS BIGINT)     AS users_total
FROM per_user
"""


@register("d35_retention", oracle=_D35_ORACLE)
def d35_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``retention(cond1, ..., condN)``: per user, flag whether the
    cohort condition (active in the first 4 days) held and whether each
    revisit window was hit; later flags are gated on the cohort flag
    (CH's r[i] = cond1 AND cond_i semantics). The report row is the
    column-wise sum — the classic retention funnel.

    Scale: two chained map-side-combinable aggregates (events→user,
    user→scalar) — the user-level state is 3 bits/user, the second
    shuffle is a single row. No joins, no Python; at 100 TB the cost is
    one fact scan."""
    ev = load(spark, sf_dir, "events")

    def win(lo: str, hi: str) -> F.Column:
        return F.max(
            F.when(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp")),
                1,
            ).otherwise(0)
        )

    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("ts") < F.lit("2024-01-05").cast("timestamp"), 1).otherwise(0)
        ).alias("c1"),
        win("2024-01-08", "2024-01-12").alias("c2"),
        win("2024-01-15", "2024-01-19").alias("c3"),
    )
    return per_user.agg(
        F.sum("c1").cast("long").alias("cohort"),
        F.sum(F.col("c1") * F.col("c2")).cast("long").alias("retained_w1"),
        F.sum(F.col("c1") * F.col("c3")).cast("long").alias("retained_w2"),
        F.count(F.lit(1)).cast("long").alias("users_total"),
    )


# ---------------------------------------------------------------------------
# d36_histogram — CH histogram(): fixed-bin exact variant
# ---------------------------------------------------------------------------

# CH's histogram() is adaptive (streaming-merged centroids) and thus not
# hash-portable; the engine ships the fixed-bin exact variant (bin width
# 50 over value's documented [0, 500) domain). min/max per bin are exact
# element picks — order-independent, hash-safe without fixed-point.
_D36_ORACLE = """
SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bin,
       CAST(FLOOR(value / 50.0) AS BIGINT) * 50.0 AS lo,
       (CAST(FLOOR(value / 50.0) AS BIGINT) + 1) * 50.0 AS hi,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       MIN(value) AS v_min,
       MAX(value) AS v_max
FROM events
GROUP BY bin
ORDER BY bin
"""


@register("d36_histogram", oracle=_D36_ORACLE)
def d36_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``histogram()`` analog, fixed-bin exact form: 50-wide bins
    over events.value with per-bin count and exact min/max. (CH's
    adaptive-centroid histogram is replaced by fixed bins because
    centroid merge order is partition-dependent — undeterministic by
    construction; the fixed-bin form is the hash-checkable contract.)

    Scale: bin id is a map-only projection; the aggregate is a ≤10-group
    hash agg with map-side combine — one scan, near-zero shuffle."""
    ev = load(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / F.lit(50.0)).cast("long")
    return (
        ev.select(bin_col.alias("bin"), "value")
        .groupBy("bin")
        .agg(
            (F.col("bin") * F.lit(50.0)).alias("lo"),
            ((F.col("bin") + F.lit(1)) * F.lit(50.0)).alias("hi"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
        .select("bin", "lo", "hi", "cnt", "v_min", "v_max")
    )


# ---------------------------------------------------------------------------
# d37_entropy — CH entropy(): Shannon entropy of a value distribution
# ---------------------------------------------------------------------------

# Terms p·ln(p) are rounded to 6 digits right after LN (libm log is not
# correctly rounded — d31/i6 precedent), then summed in exact fixed
# point; the final /ln(2) uses one shared literal.
_LN2 = "0.6931471805599453"

_D37_ORACLE = f"""
WITH cells AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  GROUP BY event_type, k
), withp AS (
  SELECT event_type, c,
         CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY event_type) AS p
  FROM cells
), typed AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS distinct_k,
         {o_dsum("ROUND(p * LN(p), 6)", 6)} AS neg_ent_nats
  FROM withp
  GROUP BY event_type
)
SELECT event_type, n, distinct_k,
       -neg_ent_nats / {_LN2} AS entropy_bits
FROM typed
ORDER BY event_type
"""


@register("d37_entropy", oracle=_D37_ORACLE)
def d37_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``entropy(x)``: Shannon entropy (bits) of the props.k value
    distribution within each event_type. Counts are exact; each p·ln(p)
    term is rounded at 6 digits immediately after the non-correctly-
    rounded LN, then fixed-point-summed so partition order cannot move
    the result; the nats→bits division uses one shared ln(2) literal.

    Scale: one (event_type, k) hash aggregate off the scan — the cell
    table is |types|·|k| ≈ 500 rows regardless of fact size — then a
    per-type window+fold over that tiny frame. A 100 TB events table
    costs one map-side-combinable scan."""
    ev = load(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type", "k")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("event_type")
    p = F.col("c").cast("double") / F.sum("c").over(w)
    term = F.round(p * F.log(p), 6)
    typed = (
        cells.withColumn("term", term)
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("distinct_k"),
            dsum("term", 6).alias("neg_ent_nats"),
        )
    )
    return typed.select(
        "event_type",
        "n",
        "distinct_k",
        (-F.col("neg_ent_nats") / F.lit(float(_LN2))).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# d38_avg_weighted — CH avgWeighted(x, w)
# ---------------------------------------------------------------------------

_D38_ORACLE = f"""
SELECT l_returnflag,
       {o_dsum("l_extendedprice * l_quantity")} AS wsum,
       {o_dsum("l_quantity")} AS wtotal,
       ({o_dsum("l_extendedprice * l_quantity")})
         / ({o_dsum("l_quantity")}) AS wavg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d38_avg_weighted", oracle=_D38_ORACLE)
def d38_avg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``avgWeighted(x, w)``: quantity-weighted mean price per
    return flag. Both Σwx and Σw are exact fixed-point sums; the final
    ratio is one IEEE division — bit-identical on any partitioning.

    Scale: a 3-group map-side-combinable aggregate; one scan."""
    li = load(spark, sf_dir, "lineitem")
    wx = F.col("l_extendedprice") * F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            dsum(wx).alias("wsum"),
            dsum("l_quantity").alias("wtotal"),
            (dsum(wx) / dsum("l_quantity")).alias("wavg_price"),
        )
        .select("l_returnflag", "wsum", "wtotal", "wavg_price")
    )


# ---------------------------------------------------------------------------
# d39_simple_linreg — CH simpleLinearRegression(x, y)
# ---------------------------------------------------------------------------

# x = days since 2024-01-01 (integer µs diff → one division: exact
# per-row); the five power sums are exact fixed-point; slope/intercept
# are a shared fragment evaluated in identical order by both engines.
_D39_X = "(CAST({ts} AS DOUBLE) - 1704067200000000.0) / 86400000000.0"

_D39_MATH = """
  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
"""

_D39_ORACLE = f"""
WITH pts AS (
  SELECT event_type,
         {_D39_X.format(ts=o_epoch_us("ts"))} AS x,
         value AS y
  FROM events
), sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {o_dsum("x", 6)} AS sx,
         {o_dsum("y", 6)} AS sy,
         {o_dsum("x * y", 6)} AS sxy,
         {o_dsum("x * x", 6)} AS sxx
  FROM pts
  GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n, {_D39_MATH}
FROM sums
ORDER BY event_type
"""


@register("d39_simple_linreg", oracle=_D39_ORACLE)
def d39_simple_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``simpleLinearRegression(x, y)``: per event_type, ordinary
    least squares of value against time-in-days. The reduction is the
    five power sums (n, Σx, Σy, Σxy, Σxx) in exact fixed point — the
    d23/d31 determinism design — and slope/intercept are post-aggregate
    arithmetic on five scalars, stated once for both engines.

    Scale: a regression is a fold: one scan, one 5-group hash agg with
    map-side combine, zero joins. The same plan at 100 TB."""
    ev = load(spark, sf_dir, "events")
    x = (epoch_us("ts").cast("double") - F.lit(1704067200000000.0)) / F.lit(
        86400000000.0
    )
    pts = ev.select("event_type", x.alias("x"), F.col("value").alias("y"))
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x", 6).alias("sx"),
        dsum("y", 6).alias("sy"),
        dsum(F.col("x") * F.col("y"), 6).alias("sxy"),
        dsum(F.col("x") * F.col("x"), 6).alias("sxx"),
    )
    m = sums.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n",
        *[frag.strip() for frag in _D39_MATH.strip().split(",\n")],
    )
    return m


# ---------------------------------------------------------------------------
# d40_cramers_v — CH cramersV(a, b): association of two categoricals
# ---------------------------------------------------------------------------

# χ² cell terms (o−e)²/e are deterministic per cell (o, r, c, n are
# exact integers; e = r·c/n is a fixed two-op IEEE expression), rounded
# at 6 digits and fixed-point-summed; the final sqrt is correctly
# rounded, so bare sqrt is hash-safe (d31 precedent).
_D40_ORACLE = """
WITH obs AS (
  SELECT event_type AS a,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS b,
         CAST(COUNT(*) AS DOUBLE) AS o
  FROM events
  GROUP BY a, b
), cells AS (
  -- zero cells participate in chi2: (0-e)^2/e = e
  SELECT ga.a, gb.b, COALESCE(obs.o, 0.0) AS o
  FROM (SELECT DISTINCT a FROM obs) ga
  CROSS JOIN (SELECT DISTINCT b FROM obs) gb
  LEFT JOIN obs ON obs.a = ga.a AND obs.b = gb.b
), tot AS (
  SELECT a, b, o,
         SUM(o) OVER (PARTITION BY a) AS r,
         SUM(o) OVER (PARTITION BY b) AS c,
         SUM(o) OVER () AS n,
         COUNT(DISTINCT a) OVER () AS ra,
         COUNT(DISTINCT b) OVER () AS cb
  FROM cells
), chi AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(MAX(ra) AS BIGINT) AS n_rows,
         CAST(MAX(cb) AS BIGINT) AS n_cols,
         CAST(SUM(CAST(FLOOR(
           ROUND((o - r * c / n) * (o - r * c / n) / (r * c / n), 6)
           * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS chi2
  FROM tot
)
SELECT n, n_rows, n_cols, chi2,
       sqrt(chi2 / (n * (CASE WHEN n_rows < n_cols THEN n_rows
                              ELSE n_cols END - 1))) AS cramers_v
FROM chi
"""


@register("d40_cramers_v", oracle=_D40_ORACLE)
def d40_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``cramersV(a, b)``: association strength between event_type
    and props.k (mod 10). Contingency counts are exact integers off one
    scan; expected counts e = r·c/n and the χ² terms are fixed-order
    IEEE expressions per cell, rounded then fixed-point summed; V is
    one correctly-rounded sqrt.

    Scale: the fact table collapses to a ≤|a|·|b| cell table (50 rows
    here) in one map-side-combinable aggregate; everything after is
    window arithmetic over that tiny frame. Same plan at 100 TB."""
    ev = load(spark, sf_dir, "events")
    obs = (
        ev.select(
            F.col("event_type").alias("a"),
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    # densify to the full a x b grid: zero cells contribute (0-e)^2/e = e
    grid = obs.select("a").distinct().crossJoin(obs.select("b").distinct())
    cells = grid.join(obs, ["a", "b"], "left").select(
        "a", "b", F.coalesce("o", F.lit(0.0)).alias("o")
    )
    tot = cells.select(
        "a",
        "b",
        "o",
        F.sum("o").over(Window.partitionBy("a")).alias("r"),
        F.sum("o").over(Window.partitionBy("b")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
        F.size(F.collect_set("a").over(Window.partitionBy())).cast("long").alias("ra"),
        F.size(F.collect_set("b").over(Window.partitionBy())).cast("long").alias("cb"),
    )
    e = F.col("r") * F.col("c") / F.col("n")
    term = F.round((F.col("o") - e) * (F.col("o") - e) / e, 6)
    chi = tot.withColumn("term", term).agg(
        F.max("n").cast("long").alias("n"),
        F.max("ra").cast("long").alias("n_rows"),
        F.max("cb").cast("long").alias("n_cols"),
        dsum("term", 6).alias("chi2"),
    )
    dof = (
        F.when(F.col("n_rows") < F.col("n_cols"), F.col("n_rows")).otherwise(
            F.col("n_cols")
        )
        - 1
    )
    return chi.select(
        "n",
        "n_rows",
        "n_cols",
        "chi2",
        F.sqrt(F.col("chi2") / (F.col("n") * dof)).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# d41_exp_decay_avg — CH exponentialTimeDecayedAvg(x, t, τ)
# ---------------------------------------------------------------------------

# Weight w_i = exp((t_i − t_max)/τ) ∈ (0, 1]: the exponent is an exact
# integer-µs difference over one literal division, EXP is rounded at 9
# digits (libm exp is not correctly rounded), and both Σw·x and Σw are
# fixed-point sums. τ = 3 days.
_D41_TAU_US = "259200000000.0"

_D41_ORACLE = f"""
WITH t AS (
  SELECT user_id, value,
         {o_epoch_us("ts")} AS t_us,
         MAX({o_epoch_us("ts")}) OVER (PARTITION BY user_id) AS t_max
  FROM events
), w AS (
  SELECT user_id, value,
         ROUND(EXP((CAST(t_us AS DOUBLE) - CAST(t_max AS DOUBLE))
                   / {_D41_TAU_US}), 9) AS wgt
  FROM t
)
SELECT user_id,
       {o_dsum("wgt * value", 6)} AS num,
       {o_dsum("wgt", 9)} AS den,
       ({o_dsum("wgt * value", 6)}) / ({o_dsum("wgt", 9)}) AS decayed_avg
FROM w
GROUP BY user_id
ORDER BY user_id
"""


@register("d41_exp_decay_avg", oracle=_D41_ORACLE)
def d41_exp_decay_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``exponentialTimeDecayedAvg(v, t, τ)``: per user, the
    recency-weighted mean of value with a 3-day half-life-scale decay
    anchored at the user's latest event — the freshness-weighted user
    score every behavioral pipeline computes. Weights are deterministic
    (integer-µs exponent, EXP rounded at 9 digits); both sums are exact
    fixed point; the ratio is one IEEE division.

    Scale: one window-max and one aggregate, both partitioned by
    user_id — a single shuffle on the natural key. No Python, no joins;
    skewed users cost what any per-user window costs (AQE skew split
    applies)."""
    ev = load(spark, sf_dir, "events")
    t_us = epoch_us("ts")
    t = ev.select(
        "user_id",
        "value",
        t_us.alias("t_us"),
        F.max(t_us).over(Window.partitionBy("user_id")).alias("t_max"),
    )
    wgt = F.round(
        F.exp(
            (F.col("t_us").cast("double") - F.col("t_max").cast("double"))
            / F.lit(float(_D41_TAU_US))
        ),
        9,
    )
    w = t.select("user_id", "value", wgt.alias("wgt"))
    return (
        w.groupBy("user_id")
        .agg(
            dsum(F.col("wgt") * F.col("value"), 6).alias("num"),
            dsum("wgt", 9).alias("den"),
            (dsum(F.col("wgt") * F.col("value"), 6) / dsum("wgt", 9)).alias(
                "decayed_avg"
            ),
        )
        .select("user_id", "num", "den", "decayed_avg")
    )


# ---------------------------------------------------------------------------
# d42_bitmap_ops — CH groupBitmap / bitmapAnd/Or/Andnot cardinalities
# ---------------------------------------------------------------------------

# CH materializes roaring bitmaps; the relational identity is per-user
# membership flags folded once — AND = a·b, OR = sign(a+b) — so the
# whole algebra is two chained map-side-combinable aggregates.
_D42_ORACLE = """
WITH flags AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
  FROM events
  GROUP BY user_id
)
SELECT CAST(SUM(a) AS BIGINT) AS card_view,
       CAST(SUM(b) AS BIGINT) AS card_purchase,
       CAST(SUM(a * b) AS BIGINT) AS card_and,
       CAST(SUM(CASE WHEN a + b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS card_or,
       CAST(SUM(a * (1 - b)) AS BIGINT) AS card_andnot
FROM flags
"""


@register("d42_bitmap_ops", oracle=_D42_ORACLE)
def d42_bitmap_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH bitmap algebra (``groupBitmap``, ``bitmapAndCardinality``,
    ``bitmapOrCardinality``, ``bitmapAndnotCardinality``) over the
    view/purchase user sets — the audience-overlap primitive. Instead
    of materialized roaring bitmaps, the engine folds per-user
    membership flags: AND = a·b, OR = sign(a+b), ANDNOT = a·(1−b).

    Scale: events → (user, 2 bits) is one map-side-combinable
    aggregate; the set algebra is a single-row fold over it. The flag
    vector generalizes to k sets at k bits per user — at 100 TB this
    beats shipping bitmaps through a shuffle."""
    ev = load(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("b"),
    )
    return flags.agg(
        F.sum("a").cast("long").alias("card_view"),
        F.sum("b").cast("long").alias("card_purchase"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("card_and"),
        F.sum(F.when(F.col("a") + F.col("b") > 0, 1).otherwise(0))
        .cast("long")
        .alias("card_or"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("card_andnot"),
    )


# ---------------------------------------------------------------------------
# d43_sum_distinct — the -Distinct combinator (sumDistinct / avgDistinct)
# ---------------------------------------------------------------------------

# Distinct-then-fixed-point-sum: the built-in sum_distinct accumulates
# doubles in partition order (non-deterministic across engines), so the
# engine form dedupes first and folds exactly.
_D43_ORACLE = f"""
WITH d AS (
  SELECT DISTINCT event_type, value FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_values,
       {o_dsum('value')} AS sum_distinct,
       ({o_dsum('value')}) / COUNT(*) AS avg_distinct
FROM d
GROUP BY event_type
ORDER BY event_type
"""


@register("d43_sum_distinct", oracle=_D43_ORACLE, tier="T3")
def d43_sum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``sumDistinct``/``avgDistinct`` (the -Distinct combinator):
    fold each distinct value once. The engine dedupes (a map-side-
    combinable distinct on (group, value)) and then runs the exact
    fixed-point fold — the built-in sum_distinct would accumulate
    doubles in partition order and break cross-engine parity.

    Scale: distinct state is |group|·|distinct values| — for a measure
    column this is the value-collapse that also powers d8d; one
    exchange."""
    ev = load(spark, sf_dir, "events")
    d = ev.select("event_type", "value").distinct()
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_values"),
            dsum("value").alias("sum_distinct"),
            (dsum("value") / F.count(F.lit(1))).alias("avg_distinct"),
        )
        .select("event_type", "n_distinct_values", "sum_distinct", "avg_distinct")
    )


# ---------------------------------------------------------------------------
# d44_mad — median absolute deviation (robust dispersion)
# ---------------------------------------------------------------------------

# Exactness discipline: medians run over integer cents (2-decimal value
# domain x100), where linear interpolation lands on exact .0/.5 — the
# d8 trick — so both engines' interpolation formulas agree bit-for-bit;
# the final /100 rescale is one shared division.
_D44_ORACLE = """
WITH cents AS (
  SELECT event_type, CAST(ROUND(value * 100.0) AS BIGINT) AS c
  FROM events
), med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS m_c
  FROM cents GROUP BY event_type
), dev AS (
  SELECT c.event_type, ABS(CAST(c.c AS DOUBLE) - m.m_c) AS adev
  FROM cents c JOIN med m ON c.event_type = m.event_type
)
SELECT d.event_type,
       MAX(m.m_c) / 100.0 AS median_value,
       quantile_cont(d.adev, 0.5) / 100.0 AS mad_value
FROM dev d JOIN med m ON d.event_type = m.event_type
GROUP BY d.event_type
ORDER BY d.event_type
"""


@register("d44_mad", oracle=_D44_ORACLE)
def d44_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event_type — the robust spread
    statistic (CH medianExact composed twice). Two exact-percentile
    passes over integer cents: median of values, then median of
    absolute deviations from it; a broadcast join carries the per-group
    median back to the rows.

    Scale: like all exact percentiles this materializes each group's
    values for the sort-based percentile (d8's caveat) — at 100 TB
    substitute the d8b sketch for both passes; the exact form is the
    correctness anchor the sketch is tested against. The join is
    broadcast (|groups| rows); two exchanges total."""
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100.0).cast("long").alias("c")
    )
    med = cents.groupBy("event_type").agg(
        F.expr("percentile(c, 0.5)").alias("m_c")
    )
    dev = cents.join(F.broadcast(med), "event_type").select(
        "event_type",
        "m_c",
        F.abs(F.col("c").cast("double") - F.col("m_c")).alias("adev"),
    )
    return (
        dev.groupBy("event_type")
        .agg(
            (F.max("m_c") / 100.0).alias("median_value"),
            (F.expr("percentile(adev, 0.5)") / 100.0).alias("mad_value"),
        )
        .select("event_type", "median_value", "mad_value")
    )


# ---------------------------------------------------------------------------
# d45_geometric_mean — exp of the exact mean of rounded logs
# ---------------------------------------------------------------------------

_D45_ORACLE = f"""
WITH lv AS (
  SELECT event_type, ROUND(LN(value), 9) AS lnv
  FROM events WHERE value > 0
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(EXP(({o_dsum('lnv', 9)}) / COUNT(*)), 9) AS geo_mean
FROM lv
GROUP BY event_type
ORDER BY event_type
"""


@register("d45_geometric_mean", oracle=_D45_ORACLE, tier="T3")
def d45_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean per event_type — exp(mean(ln x)), the right
    average for multiplicative quantities. Both transcendentals are
    rounded at production (LN at 9 before the exact fixed-point sum,
    EXP at 9 after the single division), so partition order cannot
    shift the result. One map-side-combinable aggregate."""
    ev = load(spark, sf_dir, "events")
    lv = ev.filter(F.col("value") > 0).select(
        "event_type", F.round(F.log("value"), 9).alias("lnv")
    )
    return (
        lv.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.exp(dsum("lnv", 9) / F.count(F.lit(1))), 9
            ).alias("geo_mean"),
        )
        .select("event_type", "n", "geo_mean")
    )


# ---------------------------------------------------------------------------
# d46_group_array_intersect — CH groupArrayIntersect: common set per group
# ---------------------------------------------------------------------------

_D46_ORACLE = """
WITH doc_words AS (
  SELECT DISTINCT lang, doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
), lang_docs AS (
  SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM doc_words GROUP BY lang
), word_reach AS (
  SELECT lang, word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS in_docs
  FROM doc_words GROUP BY lang, word
)
SELECT w.lang,
       MAX(l.n_docs) AS n_docs,
       CAST(SUM(CASE WHEN w.in_docs = l.n_docs THEN 1 ELSE 0 END) AS BIGINT)
         AS n_common_words,
       COALESCE(array_to_string(list_sort(list(
         CASE WHEN w.in_docs = l.n_docs THEN w.word END)), ','), '')
         AS common_words
FROM word_reach w JOIN lang_docs l ON w.lang = l.lang
GROUP BY w.lang
ORDER BY w.lang
"""


@register("d46_group_array_intersect", oracle=_D46_ORACLE, tier="T3")
def d46_group_array_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``groupArrayIntersect``: the words present in EVERY document
    of a language — aggregate set intersection. The scalable identity:
    a word is in the intersection iff its distinct-doc reach equals the
    group's doc count, so the whole operator is two counting aggregates
    — no pairwise array intersection, no accumulating set state that a
    single straggler row could blow up.

    Scale: explode once, two map-side-combinable aggregates on
    (lang, word) and (lang); the intersection itself is a filter."""
    docs = load(spark, sf_dir, "documents")
    doc_words = docs.select(
        "lang", "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    lang_docs = doc_words.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    word_reach = doc_words.groupBy("lang", "word").agg(
        F.countDistinct("doc_id").cast("long").alias("in_docs")
    )
    j = word_reach.join(F.broadcast(lang_docs), "lang")
    common = F.when(F.col("in_docs") == F.col("n_docs"), F.col("word"))
    return (
        j.groupBy("lang")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.sum(F.when(F.col("in_docs") == F.col("n_docs"), 1).otherwise(0))
            .cast("long")
            .alias("n_common_words"),
            F.coalesce(
                F.array_join(F.array_sort(F.collect_list(common)), ","),
                F.lit(""),
            ).alias("common_words"),
        )
        .select("lang", "n_docs", "n_common_words", "common_words")
    )


# ---------------------------------------------------------------------------
# d47_group_bit — CH groupBitAnd / groupBitOr / groupBitXor
# ---------------------------------------------------------------------------

_D47_ORACLE = """
WITH k AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
  FROM events
)
SELECT event_type,
       CAST(bit_and(kv) AS BIGINT) AS k_and,
       CAST(bit_or(kv) AS BIGINT) AS k_or,
       CAST(bit_xor(kv) AS BIGINT) AS k_xor,
       CAST(COUNT(*) AS BIGINT) AS n
FROM k
GROUP BY event_type
ORDER BY event_type
"""


@register("d47_group_bit", oracle=_D47_ORACLE, tier="T3")
def d47_group_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``groupBitAnd/groupBitOr/groupBitXor``: bitwise folds over a
    group — flag-mask accumulation (which feature bits were ever set /
    always set / set an odd number of times). All three are
    associative+commutative integer folds: map-side-combinable, exact,
    order-independent by construction. One scan."""
    ev = load(spark, sf_dir, "events")
    k = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("kv"),
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.bit_and("kv").cast("long").alias("k_and"),
            F.bit_or("kv").cast("long").alias("k_or"),
            F.bit_xor("kv").cast("long").alias("k_xor"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select("event_type", "k_and", "k_or", "k_xor", "n")
    )


# ---------------------------------------------------------------------------
# d48_rank_corr — CH rankCorr: Spearman rank correlation
# ---------------------------------------------------------------------------

# Average ranks (ties -> .5 fractions) are exact multiples of 0.5, and
# their products exact multiples of 0.25 -> fixed-point at scale 2
# captures every sum exactly; the Pearson-on-ranks fragment is shared.
_D48_MATH = """
  (n * sxy - sx * sy)
    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rank_corr
"""

_D48_ORACLE = f"""
WITH pts AS (
  SELECT event_type, value,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
  FROM events
), rn AS (
  SELECT event_type, value, kv,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY value) AS DOUBLE) AS rnx,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY kv) AS DOUBLE) AS rny
  FROM pts
), ranked AS (
  SELECT event_type,
         AVG(rnx) OVER (PARTITION BY event_type, value) AS rx,
         AVG(rny) OVER (PARTITION BY event_type, kv) AS ry
  FROM rn
), sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {o_dsum_wide('rx', 2)} AS sx, {o_dsum_wide('ry', 2)} AS sy,
         {o_dsum_wide('rx * ry', 2)} AS sxy,
         {o_dsum_wide('rx * rx', 2)} AS sxx,
         {o_dsum_wide('ry * ry', 2)} AS syy
  FROM ranked
  GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n, {_D48_MATH}
FROM sums
ORDER BY event_type
"""


@register("d48_rank_corr", oracle=_D48_ORACLE)
def d48_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``rankCorr(x, y)``: Spearman correlation between value and
    props.k per event_type — Pearson on average ranks (ties get the
    standard midrank, an exact .5 fraction, so every sum is exact in
    scale-2 fixed point over a DECIMAL(38) carrier — rank products
    grow ~n³ and overflow int64 near 1M rows/group, found by
    scripts/stress.py and fixed with dsum_wide). Monotone-robust association for pipelines
    where Pearson's linearity assumption lies.

    Scale: ranking is two windows partitioned by (type) — the same
    shuffle a sort-based rank costs anywhere; the reduction is five
    exact sums, map-side-combinable. Same plan at any size (window
    skew = hottest single group, the usual AQE lever)."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("kv"),
    )
    def midrank(col: str):
        rn = F.row_number().over(
            Window.partitionBy("event_type").orderBy(col)
        ).cast("double")
        return F.avg(rn).over(Window.partitionBy("event_type", col))

    ranked = pts.select(
        "event_type",
        midrank("value").alias("rx"),
        midrank("kv").alias("ry"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum_wide("rx", 2).alias("sx"),
        dsum_wide("ry", 2).alias("sy"),
        dsum_wide(F.col("rx") * F.col("ry"), 2).alias("sxy"),
        dsum_wide(F.col("rx") * F.col("rx"), 2).alias("sxx"),
        dsum_wide(F.col("ry") * F.col("ry"), 2).alias("syy"),
    )
    return sums.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n",
        _D48_MATH.strip().rstrip(","),
    )


# ---------------------------------------------------------------------------
# d49_theils_u — CH theilsU: uncertainty coefficient U(X|Y)
# ---------------------------------------------------------------------------

# U(X|Y) = (H(X) − H(X|Y)) / H(X), with H terms as rounded-ln
# fixed-point sums (the d37 discipline): H(X) folds marginal cells,
# H(X|Y) folds joint cells against the Y-marginal.
_D49_ORACLE = f"""
WITH cells AS (
  SELECT event_type AS x,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS y,
         CAST(COUNT(*) AS DOUBLE) AS cxy
  FROM events GROUP BY x, y
), tot AS (
  SELECT x, y, cxy,
         SUM(cxy) OVER (PARTITION BY x) AS cx,
         SUM(cxy) OVER (PARTITION BY y) AS cy,
         SUM(cxy) OVER () AS n
  FROM cells
), terms AS (
  SELECT ROUND((cxy / n) * LN(cxy / cy), 9) AS hcond_term
  FROM tot
), hx AS (
  SELECT {o_dsum("ROUND((cx / n) * LN(cx / n), 9)", 9)} AS neg_hx
  FROM (SELECT DISTINCT x, MAX(cx) AS cx, MAX(n) AS n
        FROM tot GROUP BY x)
), hcond AS (
  SELECT {o_dsum('hcond_term', 9)} AS neg_hcond FROM terms
)
SELECT (-hx.neg_hx) AS h_x,
       (-hcond.neg_hcond) AS h_x_given_y,
       ((-hx.neg_hx) - (-hcond.neg_hcond)) / (-hx.neg_hx) AS theils_u
FROM hx CROSS JOIN hcond
"""


@register("d49_theils_u", oracle=_D49_ORACLE, tier="T3")
def d49_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``theilsU``: the asymmetric uncertainty coefficient — what
    fraction of event_type's entropy is explained by knowing props.k
    (mod 10). Completes the association trio next to d40 cramersV
    (symmetric) and d48 rankCorr (ordinal). Every entropy term is
    rounded at 9 right after LN and fixed-point summed; the final
    three-scalar arithmetic is shared.

    Scale: one (x, y) cell aggregate off the scan (≤50 cells); all
    entropy work happens on that tiny frame."""
    ev = load(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.col("event_type").alias("x"),
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("double").alias("cxy"))
    )
    tot = cells.select(
        "x",
        "y",
        "cxy",
        F.sum("cxy").over(Window.partitionBy("x")).alias("cx"),
        F.sum("cxy").over(Window.partitionBy("y")).alias("cy"),
        F.sum("cxy").over(Window.partitionBy()).alias("n"),
    )
    hx_cells = tot.groupBy("x").agg(
        F.max("cx").alias("cx"), F.max("n").alias("n")
    )
    hx = hx_cells.agg(
        dsum(F.round((F.col("cx") / F.col("n")) * F.log(F.col("cx") / F.col("n")), 9), 9).alias(
            "neg_hx"
        )
    )
    hcond = tot.agg(
        dsum(
            F.round(
                (F.col("cxy") / F.col("n")) * F.log(F.col("cxy") / F.col("cy")),
                9,
            ),
            9,
        ).alias("neg_hcond")
    )
    return (
        hx.crossJoin(hcond)
        .select(
            (-F.col("neg_hx")).alias("h_x"),
            (-F.col("neg_hcond")).alias("h_x_given_y"),
            (
                ((-F.col("neg_hx")) - (-F.col("neg_hcond"))) / (-F.col("neg_hx"))
            ).alias("theils_u"),
        )
    )


# ---------------------------------------------------------------------------
# d50_auc — CH arrayAUC analog: exact ROC-AUC by the rank-sum identity
# ---------------------------------------------------------------------------

# AUC = (Σ midrank(positives) − P(P+1)/2) / (P·N). Midranks never
# materialize per row: the fact collapses to per-distinct-score
# (n_pos, n_tot) counts (the d32 idiom) and DOUBLED midranks are pure
# integers from the exclusive cumulative count — 2·midrank(v) =
# 2·cum(<v) + n(v) + 1 — so the rank sum is exact int arithmetic
# walking DISTINCT VALUES, not rows; /2 happens once in the shared
# final fragment. Identical value to the old per-row midrank form.
_D50_ORACLE = """
WITH pts AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         value AS score
  FROM events
  WHERE event_type IN ('purchase', 'click')
), vc AS (
  SELECT score, SUM(label) AS n_pos, COUNT(*) AS n_tot
  FROM pts GROUP BY score
), c AS (
  SELECT n_pos, n_tot,
         SUM(n_tot) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tot
  FROM vc
), sums AS (
  SELECT CAST(SUM(n_pos) AS DOUBLE) AS p,
         CAST(SUM(n_tot - n_pos) AS DOUBLE) AS nneg,
         CAST(SUM(n_pos * (2 * (cum_tot - n_tot) + n_tot + 1)) AS DOUBLE)
           AS prs2
  FROM c
)
SELECT CAST(p AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
       (prs2 / 2.0 - p * (p + 1.0) / 2.0) / (p * nneg) AS auc
FROM sums
"""


@register("d50_auc", oracle=_D50_ORACLE)
def d50_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``arrayAUC`` as a relational aggregate: the exact ROC-AUC of
    'value predicts purchase-vs-click' via the Mann-Whitney rank-sum
    identity. Ties get midranks, but no rank is ever assigned to a
    ROW: per-distinct-score (n_pos, n_tot) counts (one map-side-
    combinable exchange, the d32 idiom) feed 2·midrank(v) = 2·cum(<v)
    + n(v) + 1 — all-integer arithmetic over distinct values. The
    model-quality gate a training pipeline runs on every scored batch.

    Scale: the cumulative count uses the two-phase parallel prefix sum
    (plans/prefix.py — range-repartitioned values, local running sums,
    broadcast offsets), so there is NO single-partition WindowExec
    anywhere: the old row-level ``row_number() OVER (ORDER BY score)``
    sorted the whole fact table on one executor; this plan's heaviest
    step is the per-score hash aggregate."""
    ev = load(spark, sf_dir, "events")
    pts = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        F.col("value").alias("score"),
    )
    vc = pts.groupBy("score").agg(
        F.sum("label").alias("n_pos"),
        F.count(F.lit(1)).alias("n_tot"),
    )
    c, _totals = running_sums(vc, ["score"], {"cum_tot": F.col("n_tot")})
    # doubled positive-midrank sum: term fits int64 past 1e9 rows; the
    # cross-value fold goes through decimal(38) like DuckDB's HUGEINT
    term = F.col("n_pos") * (
        2 * (F.col("cum_tot") - F.col("n_tot")) + F.col("n_tot") + 1
    )
    sums = c.agg(
        F.sum("n_pos").cast("double").alias("p"),
        F.sum(F.col("n_tot") - F.col("n_pos")).cast("double").alias("nneg"),
        F.sum(term.cast("decimal(38,0)")).cast("double").alias("prs2"),
    )
    return sums.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("nneg").cast("long").alias("n_neg"),
        (
            (F.col("prs2") / 2.0 - F.col("p") * (F.col("p") + 1.0) / 2.0)
            / (F.col("p") * F.col("nneg"))
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# d51_or_default — CH -OrDefault / -OrNull combinators on empty groups
# ---------------------------------------------------------------------------

_D51_ORACLE = """
WITH rich AS (
  SELECT c_nationkey, c_acctbal FROM customer WHERE c_acctbal > 9990
)
SELECT n.n_nationkey, n.n_name,
       CAST(COUNT(r.c_acctbal) AS BIGINT) AS n_rich,
       MAX(r.c_acctbal) AS max_bal_or_null,
       COALESCE(MAX(r.c_acctbal), 0.0) AS max_bal_or_default,
       CAST(CASE WHEN COUNT(r.c_acctbal) = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS group_was_empty
FROM nation n LEFT JOIN rich r ON r.c_nationkey = n.n_nationkey
GROUP BY n.n_nationkey, n.n_name
ORDER BY n.n_nationkey
"""


@register("d51_or_default", oracle=_D51_ORACLE, tier="T3")
def d51_or_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``maxOrNull``/``maxOrDefault`` combinator semantics: groups
    that exist in the dimension but match NOTHING after the filter
    must still appear — aggregate-over-empty yields NULL (the -OrNull
    contract) or the type default under COALESCE (-OrDefault). A plain
    GROUP BY over the filtered fact silently drops those nations; the
    LEFT JOIN from the dimension is what preserves them, and this
    query pins both behaviors side by side.

    Scale: dimension-driven LEFT JOIN with the filtered fact broadcast
    when small (here) or shuffled on the key — either way the empty
    groups cost |dimension| rows, not a scan."""
    nat = load(spark, sf_dir, "nation")
    rich = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9990)
        .select("c_nationkey", "c_acctbal")
    )
    j = nat.join(
        rich, rich["c_nationkey"] == nat["n_nationkey"], "left"
    )
    return (
        j.groupBy("n_nationkey", "n_name")
        .agg(
            F.count("c_acctbal").cast("long").alias("n_rich"),
            F.max("c_acctbal").alias("max_bal_or_null"),
            F.coalesce(F.max("c_acctbal"), F.lit(0.0)).alias(
                "max_bal_or_default"
            ),
            F.when(F.count("c_acctbal") == 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("group_was_empty"),
        )
        .select(
            "n_nationkey", "n_name", "n_rich", "max_bal_or_null",
            "max_bal_or_default", "group_was_empty",
        )
    )


# ---------------------------------------------------------------------------
# d52_avg_map — CH avgMap: keyed mean merge (closes the -Map family)
# ---------------------------------------------------------------------------

# Keyed partial states (count, fixed-point sum) merge associatively;
# the mean renders per key at the end — same canonical "k:v" string
# assembly as d34 so the map value is hash-portable.
_D52_ORACLE = """
WITH per AS (
  SELECT event_type,
         (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hour_utc,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT) AS s_fp
  FROM events
  GROUP BY event_type, hour_utc
), rendered AS (
  SELECT event_type, hour_utc,
         concat(CAST(hour_utc AS VARCHAR), ':',
                CAST(ROUND(CAST(s_fp AS DOUBLE) / 10000.0 / c, 6)
                     AS VARCHAR)) AS kv
  FROM per
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       array_to_string(list_sort(list(kv)), ',') AS avg_map
FROM rendered
GROUP BY event_type
ORDER BY event_type
"""


@register("d52_avg_map", oracle=_D52_ORACLE, tier="T3")
def d52_avg_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``avgMap``: per-key means merged across rows — the missing
    member next to sumMap (d19) and minMap/maxMap (d34). The mergeable
    state per key is (count, fixed-point sum); the mean is rendered
    once at the end (ROUND 6 — a ratio of exact integers, identical on
    both engines) into the canonical sorted k:v string.

    Scale: two map-side-combinable hash aggregates; second-stage
    cardinality is |groups|·|keys|."""
    ev = load(spark, sf_dir, "events")
    hour = F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hour_utc")
    per = (
        ev.select("event_type", hour, fixed_point("value").alias("v_fp"))
        .groupBy("event_type", "hour_utc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("v_fp").cast("long").alias("s_fp"),
        )
    )
    mean_str = F.round(
        F.col("s_fp").cast("double") / 10000.0 / F.col("c"), 6
    ).cast("string")
    rendered = per.select(
        "event_type",
        "hour_utc",
        F.concat_ws(":", F.col("hour_utc").cast("string"), mean_str).alias("kv"),
    )
    return (
        rendered.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.array_join(F.array_sort(F.collect_list("kv")), ",").alias(
                "avg_map"
            ),
        )
        .select("event_type", "n_keys", "avg_map")
    )


# ---------------------------------------------------------------------------
# d53_bool_aggs — bool_and / bool_or / count_if
# ---------------------------------------------------------------------------

_D53_ORACLE = """
SELECT event_type,
       bool_and(value > 1.0) AS all_above_1,
       bool_or(value > 400.0) AS any_above_400,
       CAST(count_if(value > 100.0) AS BIGINT) AS n_above_100,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("d53_bool_aggs", oracle=_D53_ORACLE, tier="T3")
def d53_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate folds — ``bool_and``/``bool_or`` (universal /
    existential quantifiers as aggregates) and ``count_if`` (CH countIf
    by its portable name). All map-side-combinable single-bit states —
    the cheapest aggregates there are."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bool_and(F.col("value") > 1.0).alias("all_above_1"),
            F.bool_or(F.col("value") > 400.0).alias("any_above_400"),
            F.count_if(F.col("value") > 100.0).cast("long").alias("n_above_100"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select("event_type", "all_above_1", "any_above_400", "n_above_100", "n")
    )


# ---------------------------------------------------------------------------
# d54_covariance — covarPop/covarSamp from exact moment sums
# ---------------------------------------------------------------------------

_D54_MATH = """
  (sxy - sx * sy / n) / n AS covar_pop,
  (sxy - sx * sy / n) / (n - 1) AS covar_samp
"""

_D54_ORACLE = f"""
WITH sums AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {o_dsum('l_quantity')} AS sx,
         {o_dsum('l_extendedprice')} AS sy,
         {o_dsum('l_quantity * l_extendedprice')} AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n, {_D54_MATH}
FROM sums
ORDER BY l_returnflag
"""


@register("d54_covariance", oracle=_D54_ORACLE, tier="T3")
def d54_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``covarPop``/``covarSamp`` from exact fixed-point moment sums
    (n, Σx, Σy, Σxy) — the d12/d23 determinism design applied to the
    one moment statistic that family didn't surface explicitly. One
    map-side-combinable aggregate; the covariances are post-aggregate
    arithmetic stated once for both engines."""
    li = load(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("l_quantity").alias("sx"),
        dsum("l_extendedprice").alias("sy"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
    )
    return sums.selectExpr(
        "l_returnflag",
        "CAST(n AS BIGINT) AS n",
        *[f.strip().rstrip(",") for f in _D54_MATH.strip().split(",\n")],
    )


# ---------------------------------------------------------------------------
# d55_moving_avg_array — CH groupArrayMovingAvg
# ---------------------------------------------------------------------------

# d26's moving-SUM trajectory with the mean rendered per position; the
# divisor is LEAST(pos, k) so the warm-up window is exact, and the
# division is one fixed-order IEEE op on exact fixed-point sums.
_D55_K = 3

_D55_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         CAST(FLOOR(value * 10000.0) AS BIGINT) AS v_fp
  FROM events WHERE event_type = 'purchase'
), win AS (
  SELECT user_id, event_id,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos,
         SUM(v_fp) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN {_D55_K - 1} PRECEDING AND CURRENT ROW) AS s_fp
  FROM seq
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, event_id, pos,
       CAST(s_fp AS DOUBLE) / 10000.0
         / LEAST(pos, {_D55_K}) AS moving_avg
FROM win
ORDER BY user_id, pos
"""


@register("d55_moving_avg_array", oracle=_D55_ORACLE, tier="T3")
def d55_moving_avg_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``groupArrayMovingAvg(k)``: the k-window moving MEAN
    trajectory per user (d26 ships the moving sum) — warm-up positions
    divide by the actual window fill (LEAST(pos, k)), so the first
    points are true prefixes, not zero-padded. Fixed-point sums keep
    the window sum exact under any frame evaluation order; one window
    shuffle on user_id."""
    ev = load(spark, sf_dir, "events")
    seq = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        fixed_point("value").alias("v_fp"),
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    frame = order.rowsBetween(-(_D55_K - 1), Window.currentRow)
    win = seq.select(
        "user_id",
        "event_id",
        F.row_number().over(order).cast("long").alias("pos"),
        F.sum("v_fp").over(frame).alias("s_fp"),
    )
    return win.select(
        "user_id",
        "event_id",
        "pos",
        (
            F.col("s_fp").cast("double")
            / 10000.0
            / F.least(F.col("pos"), F.lit(_D55_K))
        ).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# d56_ks_test — CH kolmogorovSmirnovTest: exact two-sample KS statistic
# ---------------------------------------------------------------------------

# The statistic is computed entirely in int64: at each distinct value v,
# the scaled ECDF gap is |ca(v)*nb - cb(v)*na| (an integer); D is the
# max gap divided once by na*nb. Overflow budget: the gap is bounded by
# na*nb, so int64 holds to ~3e9 rows per sample — document past that,
# switch the product to a DECIMAL(38) carrier (the d48 lesson).
# Empty-sample guard: KS is undefined when either sample is empty —
# both engines surface NULL instead of ANSI divide-by-zero (Spark) vs
# IEEE NaN (DuckDB), which would both crash or diverge the hash.
_D56_MATH = """
  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
       ELSE CAST(d_num AS DOUBLE)
            / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS ks_d
"""

_D56_ORACLE = f"""
WITH pts AS (
  SELECT value,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
         CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END AS b
  FROM events WHERE event_type IN ('click', 'view')
), g AS (
  SELECT value, CAST(SUM(a) AS BIGINT) AS ca, CAST(SUM(b) AS BIGINT) AS cb
  FROM pts GROUP BY value
), c AS (
  SELECT SUM(ca) OVER (ORDER BY value) AS cca,
         SUM(cb) OVER (ORDER BY value) AS ccb,
         SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
  FROM g
), s AS (
  SELECT CAST(COALESCE(MAX(na), 0) AS BIGINT) AS n_a,
         CAST(COALESCE(MAX(nb), 0) AS BIGINT) AS n_b,
         CAST(MAX(ABS(cca * nb - ccb * na)) AS BIGINT) AS d_num
  FROM c
)
SELECT n_a, n_b, d_num, {_D56_MATH.strip().rstrip(',')}
FROM s
"""


@register("d56_ks_test", oracle=_D56_ORACLE, tier="T3")
def d56_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``kolmogorovSmirnovTest(x, grp)``: exact two-sample KS
    statistic between the 'click' and 'view' value distributions.
    D = max_v |F_a(v) - F_b(v)| is evaluated as the INTEGER
    ``|ca(v)·nb - cb(v)·na|`` at every distinct value, so the whole
    computation is order-independent int64 arithmetic; the single
    final division is the shared fragment. The distribution-shift
    alarm for a replication pipeline (did the migrated column drift?)
    and for training-data source monitoring.

    Scale: the ECDF prefix sum is NOT a single-partition window — it
    runs as the two-phase parallel prefix sum (the shared
    plans/prefix.py implementation this operator pioneered): distinct
    values range-repartitioned, local running sums, per-partition
    totals (<= 32 rows) broadcast back as offsets. Everything else is
    map-side-combinable aggregation; driver traffic is <= #partitions
    rows."""
    ev = load(spark, sf_dir, "events")
    pts = ev.filter(F.col("event_type").isin("click", "view")).select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("b"),
    )
    g = pts.groupBy("value").agg(
        F.sum("a").cast("long").alias("ca"), F.sum("b").cast("long").alias("cb")
    )
    cum, totals = running_sums(
        g, ["value"], {"cca": F.col("ca"), "ccb": F.col("cb")}
    )
    na, nb = totals["cca"], totals["ccb"]
    gaps = cum.select(
        F.abs(
            F.col("cca") * F.lit(nb) - F.col("ccb") * F.lit(na)
        ).alias("gap")
    )
    s = gaps.agg(F.max("gap").cast("long").alias("d_num")).select(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        "d_num",
    )
    return s.selectExpr("n_a", "n_b", "d_num", _D56_MATH.strip().rstrip(","))


# ---------------------------------------------------------------------------
# d57_anova_f — CH analysisOfVariance (anova): one-way ANOVA F statistic
# ---------------------------------------------------------------------------

# Per-group exact sums (scale-4 fixed point; value domain [0, 500) keeps
# value^2 sums inside int64 past 1e9 rows/group), then the group-level
# term s_g^2/n_g re-enters a second fixed-point fold so the cross-group
# reduction is order-independent too. The F arithmetic is one shared
# fragment evaluated in identical IEEE order by both engines.
# F undefined below 2 groups or with zero residual dof -> NULL (the
# d56 guard discipline: never ANSI-crash where DuckDB would IEEE-NaN).
_D57_MATH = """
  (t - st * st / n) AS ss_between,
  (sst - t) AS ss_within,
  CASE WHEN kk <= 1.0 OR n <= kk THEN NULL
       ELSE ((t - st * st / n) / (kk - 1.0)) / ((sst - t) / (n - kk))
       END AS f_stat
"""

_D57_ORACLE = f"""
WITH per_group AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n_g,
         {o_dsum('value')} AS s_g,
         {o_dsum('value * value')} AS ss_g
  FROM events
  GROUP BY event_type
), sums AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS kk,
         SUM(CAST(n_g AS BIGINT)) AS n_i,
         {o_dsum('(s_g * s_g) / n_g')} AS t,
         {o_dsum('s_g')} AS st,
         {o_dsum('ss_g')} AS sst
  FROM per_group
)
SELECT CAST(kk AS BIGINT) AS k_groups, CAST(n_i AS BIGINT) AS n_rows,
       {', '.join(f.strip() for f in _D57_MATH.strip().split(',' + chr(10)))}
FROM (SELECT kk, CAST(n_i AS DOUBLE) AS n, n_i, t, st, sst FROM sums)
"""


@register("d57_anova_f", oracle=_D57_ORACLE, tier="T3")
def d57_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``analysisOfVariance(value, group)``: one-way ANOVA F
    statistic across the event_type groups. SSB/SSW come from the
    per-group power sums (SSB = Σ s_g²/n_g − S²/N; SSW = Σ ss_g − Σ
    s_g²/n_g); every float reduction — including the cross-group fold
    of the s_g²/n_g terms — goes through fixed point, so the result is
    bit-identical under any partitioning. The final F arithmetic is a
    shared fragment.

    Scale: two chained map-side-combinable hash aggregates (fact →
    group, group → scalar), zero joins, zero Python — one fact scan at
    any size."""
    ev = load(spark, sf_dir, "events")
    per_group = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_g"),
        dsum("value").alias("s_g"),
        dsum(F.col("value") * F.col("value")).alias("ss_g"),
    )
    sums = per_group.agg(
        F.count(F.lit(1)).cast("double").alias("kk"),
        F.sum(F.col("n_g").cast("long")).alias("n_i"),
        dsum(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("t"),
        dsum("s_g").alias("st"),
        dsum("ss_g").alias("sst"),
    )
    prepared = sums.selectExpr(
        "kk", "CAST(n_i AS DOUBLE) AS n", "n_i", "t", "st", "sst"
    )
    return prepared.selectExpr(
        "CAST(kk AS BIGINT) AS k_groups",
        "CAST(n_i AS BIGINT) AS n_rows",
        *[f.strip().rstrip(",") for f in _D57_MATH.strip().split(",\n")],
    )


# ---------------------------------------------------------------------------
# d61_corr_matrix — CH corrMatrix: all pairwise correlations, ONE scan
# ---------------------------------------------------------------------------

# Ten exact sums give every pairwise Pearson r. Second-order price
# terms ride the DECIMAL(38) carrier (price^2 ~ 1e10 -> scale-4 sums
# pass int64 at ~1e5 rows/group — the d48 overflow lesson, applied
# up front). The Pearson fragment is shared verbatim, three times.
def _d61_r(a: str, b: str) -> str:
    # zero-variance guard (d56 discipline): r undefined -> NULL, never
    # an ANSI divide-by-zero / IEEE-NaN divergence
    var = (
        f"(n * s{a}{a} - s{a} * s{a}) * (n * s{b}{b} - s{b} * s{b})"
    )
    return (
        f"CASE WHEN {var} <= 0.0 THEN NULL ELSE (n * s{a}{b} - s{a} * s{b})"
        f" / sqrt({var}) END"
    )


_D61_MATH = f"""
  {_d61_r('x', 'y')} AS corr_qty_price,
  {_d61_r('x', 'z')} AS corr_qty_disc,
  {_d61_r('y', 'z')} AS corr_price_disc
"""

_D61_ORACLE = f"""
WITH sums AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {o_dsum_wide('l_quantity')} AS sx,
         {o_dsum_wide('l_extendedprice')} AS sy,
         {o_dsum_wide('l_discount')} AS sz,
         {o_dsum_wide('l_quantity * l_quantity')} AS sxx,
         {o_dsum_wide('l_extendedprice * l_extendedprice')} AS syy,
         {o_dsum_wide('l_discount * l_discount')} AS szz,
         {o_dsum_wide('l_quantity * l_extendedprice')} AS sxy,
         {o_dsum_wide('l_quantity * l_discount')} AS sxz,
         {o_dsum_wide('l_extendedprice * l_discount')} AS syz
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n, {_D61_MATH}
FROM sums
ORDER BY l_returnflag
"""


@register("d61_corr_matrix", oracle=_D61_ORACLE, tier="T3")
def d61_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``corrMatrix(x, y, z)``: EVERY pairwise Pearson correlation
    from ONE scan — ten exact power sums per group, then the shared
    Pearson fragment evaluated three times in identical IEEE order.
    N separate corr() calls would scan N(N-1)/2 times; the matrix form
    is how feature-correlation audits run over wide fact tables.

    Scale: one map-side-combinable hash aggregate (ten bigdecimal
    lanes), zero joins; post-aggregate arithmetic on |groups| rows."""
    li = load(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum_wide(q).alias("sx"),
        dsum_wide(p).alias("sy"),
        dsum_wide(d).alias("sz"),
        dsum_wide(q * q).alias("sxx"),
        dsum_wide(p * p).alias("syy"),
        dsum_wide(d * d).alias("szz"),
        dsum_wide(q * p).alias("sxy"),
        dsum_wide(q * d).alias("sxz"),
        dsum_wide(p * d).alias("syz"),
    )
    return sums.selectExpr(
        "l_returnflag",
        "CAST(n AS BIGINT) AS n",
        *[f.strip().rstrip(",") for f in _D61_MATH.strip().split(",\n")],
    )


# ---------------------------------------------------------------------------
# d40b_cramers_v_corrected — CH cramersVBiasCorrected
# ---------------------------------------------------------------------------

# Bergsma's bias correction on d40's exact chi2: phi2~ = max(0,
# phi2 - (r-1)(c-1)/(n-1)), with shrunken row/col counts. Pure scalar
# arithmetic on the same five exact inputs; fragment shared verbatim.
# The counts are pre-cast to DOUBLE: Spark types the literal `1.0` as
# DECIMAL(2,1) and `bigint - decimal` STAYS decimal (scale-rounded
# division gave 0.003600 for 36/9999), while DuckDB promotes the same
# text to double — cast first and both engines run pure IEEE.
_D40B_MATH = """
  CASE WHEN chi2 / nd - (rd - 1.0) * (cd - 1.0) / (nd - 1.0) > 0.0
       THEN chi2 / nd - (rd - 1.0) * (cd - 1.0) / (nd - 1.0)
       ELSE 0.0 END AS phi2_tilde,
  rd - (rd - 1.0) * (rd - 1.0) / (nd - 1.0) AS r_tilde,
  cd - (cd - 1.0) * (cd - 1.0) / (nd - 1.0) AS c_tilde
"""

_D40B_FINAL = """
  sqrt(phi2_tilde
       / (CASE WHEN r_tilde < c_tilde THEN r_tilde ELSE c_tilde END - 1.0))
    AS cramers_v_corrected
"""

_D40B_ORACLE = f"""
WITH base AS ({_D40_ORACLE.strip()}), cast_ AS (
  SELECT n, n_rows, n_cols, chi2, cramers_v,
         CAST(n AS DOUBLE) AS nd, CAST(n_rows AS DOUBLE) AS rd,
         CAST(n_cols AS DOUBLE) AS cd
  FROM base
), m AS (
  SELECT n, n_rows, n_cols, chi2, cramers_v, {_D40B_MATH} FROM cast_
)
SELECT n, n_rows, n_cols, chi2, cramers_v, phi2_tilde, {_D40B_FINAL}
FROM m
"""


@register("d40b_cramers_v_corrected", oracle=_D40B_ORACLE, tier="T3")
def d40b_cramers_v_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``cramersVBiasCorrected``: Bergsma's small-sample correction
    on d40's exact χ² — φ² shrunk by its expectation under
    independence, row/col counts shrunk likewise, clamped at zero. The
    uncorrected V overstates association in small or sparse tables;
    pipelines comparing association across differently-sized slices
    need the corrected form or the ranking is biased toward small
    groups. All arithmetic is a shared fragment over d40's five exact
    scalars.

    Scale: identical to d40 (one map-side-combinable cell aggregate);
    the correction is constant work on one row."""
    base = d40_cramers_v(spark, sf_dir)
    cast_ = base.selectExpr(
        "n", "n_rows", "n_cols", "chi2", "cramers_v",
        "CAST(n AS DOUBLE) AS nd", "CAST(n_rows AS DOUBLE) AS rd",
        "CAST(n_cols AS DOUBLE) AS cd",
    )
    m = cast_.selectExpr(
        "n", "n_rows", "n_cols", "chi2", "cramers_v",
        *[f.strip().rstrip(",") for f in _D40B_MATH.strip().split(",\n")],
    )
    return m.selectExpr(
        "n", "n_rows", "n_cols", "chi2", "cramers_v", "phi2_tilde",
        _D40B_FINAL.strip(),
    )


# ---------------------------------------------------------------------------
# d41b_exp_decay_bucketed — bit-portable decay via a shared weight table
# ---------------------------------------------------------------------------

# The 1B-row stress run caught d41's limit: with 1e9 EXP evaluations,
# cross-libm 1-ulp differences eventually land within an ulp of a
# 9-digit rounding boundary and the fixed-point sums step apart —
# continuous transcendental decay is inherently not bit-portable
# between independent libm implementations at that row count. The
# scale-proof variant quantizes age to HOURS and reads the weight from
# a 720-entry table computed ONCE in Python: both engines parse the
# same decimal literals, so no transcendental runs at query time and
# the result is bit-identical at ANY row count.
_D41B_TAU_HOURS = 72.0  # same 3-day decay scale as d41
_D41B_MAX_H = 719  # events span 30 days; clamp defensively

_D41B_WEIGHTS = [
    float(repr(__import__("math").exp(-h / _D41B_TAU_HOURS)))
    for h in range(_D41B_MAX_H + 1)
]

_D41B_ORACLE = f"""
WITH wt(h, wgt) AS (
  VALUES {", ".join(f"({h}, {w!r})" for h, w in enumerate(_D41B_WEIGHTS))}
), t AS (
  SELECT user_id, value,
         {o_epoch_us("ts")} AS t_us,
         MAX({o_epoch_us("ts")}) OVER (PARTITION BY user_id) AS t_max
  FROM events
), b AS (
  SELECT user_id, value,
         LEAST((t_max - t_us) // 3600000000, {_D41B_MAX_H}) AS h
  FROM t
)
SELECT user_id,
       {o_dsum("wgt * value", 6)} AS num,
       {o_dsum("wgt", 9)} AS den,
       ({o_dsum("wgt * value", 6)}) / ({o_dsum("wgt", 9)}) AS decayed_avg
FROM b JOIN wt USING (h)
GROUP BY user_id
ORDER BY user_id
"""


@register("d41b_exp_decay_bucketed", oracle=_D41B_ORACLE, tier="T3")
def d41b_exp_decay_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d41's freshness-weighted mean with HOUR-bucketed decay — the
    bit-portable-at-any-scale variant. The 1e9-row stress sweep proved
    the continuous form's limit (independently computed EXP differs by
    an ulp often enough to cross any rounding grid at that volume);
    here the 720 hourly weights are computed once driver-side and
    shipped to BOTH engines as identical decimal literals (repr
    round-trips doubles exactly), so query-time arithmetic is
    multiply-sum only — deterministic at 1e9 rows and beyond, verified
    by the harness.

    Scale: one window-max + a broadcast join against 720 rows + one
    fixed-point aggregate — same single user-key shuffle as d41."""
    ev = load(spark, sf_dir, "events")
    t_us = epoch_us("ts")
    t = ev.select(
        "user_id",
        "value",
        t_us.alias("t_us"),
        F.max(t_us).over(Window.partitionBy("user_id")).alias("t_max"),
    )
    b = t.select(
        "user_id",
        "value",
        F.least(
            F.expr("(t_max - t_us) div 3600000000"), F.lit(_D41B_MAX_H)
        ).alias("h"),
    )
    wt = F.broadcast(
        spark.createDataFrame(
            list(enumerate(_D41B_WEIGHTS)), "h long, wgt double"
        )
    )
    w = b.join(wt, "h")
    return (
        w.groupBy("user_id")
        .agg(
            dsum(F.col("wgt") * F.col("value"), 6).alias("num"),
            dsum("wgt", 9).alias("den"),
            (dsum(F.col("wgt") * F.col("value"), 6) / dsum("wgt", 9)).alias(
                "decayed_avg"
            ),
        )
        .select("user_id", "num", "den", "decayed_avg")
    )
