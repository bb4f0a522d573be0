"""Golden composite suite (SURVEY.md §5.3 item 4): TPC-H-derived query
shapes composing the §2 operators end-to-end — the 'can a user actually
run their reporting workload' check on top of per-operator parity.
(Q1→d1, Q3→c12, Q5→c10 already exist; this module adds Q6/Q12/Q14
shapes.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import dmean, dsum, o_dmean, o_dsum
from mysql_to_clickhouse_spark.functions.text import tokens
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


# ---------------------------------------------------------------------------
# x4_training_pipeline — the LLM-data composite: quality-filter → exact
# dedup → per-language corpus stats, §2.I operators composed end-to-end
# ---------------------------------------------------------------------------

_X4_ORACLE = f"""
WITH feats AS (
  SELECT doc_id, lang, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS n_distinct,
         CAST(len(list_filter(string_split(text, ' '), t -> length(t) <= 3))
              AS BIGINT) AS n_short
  FROM documents
), scored AS (
  SELECT doc_id, lang, text, n_tokens,
         0.5 * (CAST(n_distinct AS DOUBLE) / n_tokens)
           + 0.3 * (1.0 - CAST(n_short AS DOUBLE) / n_tokens)
           + 0.2 * LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
           AS quality_score
  FROM feats
), kept AS (
  SELECT * FROM scored WHERE quality_score >= 0.6
), deduped AS (
  SELECT md5(text) AS content_hash,
         MIN(doc_id) AS keeper_doc_id,
         min_by(lang, doc_id) AS lang,
         min_by(n_tokens, doc_id) AS n_tokens,
         min_by(quality_score, doc_id) AS quality_score
  FROM kept
  GROUP BY content_hash
)
SELECT lang,
       COUNT(*) AS kept_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       {o_dmean('quality_score')} AS avg_quality
FROM deduped
GROUP BY lang
ORDER BY lang
"""


@register("x4_training_pipeline", oracle=_X4_ORACLE)
def x4_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-training-data composite a real user runs end-to-end:
    i10's quality scoring (map-side) filters low-quality docs, i1's
    md5 exact dedup keeps the min-doc_id representative (one shuffle on
    the digest; min_by carries the keeper's attributes in the same
    aggregate — no join-back), then per-language corpus stats (second
    small shuffle over one row per unique doc). Two shuffles total,
    both over reduced data; scoring never leaves the scan stage."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_short = F.size(F.filter(toks, lambda t: F.length(t) <= 3)).cast("long")
    diversity = n_distinct.cast("double") / n_tokens
    short_ratio = n_short.cast("double") / n_tokens
    sat = F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        n_tokens.alias("n_tokens"),
        (0.5 * diversity + 0.3 * (1.0 - short_ratio) + 0.2 * sat).alias(
            "quality_score"
        ),
    )
    kept = scored.filter(F.col("quality_score") >= 0.6)
    deduped = kept.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("n_tokens", "doc_id").alias("n_tokens"),
        F.min_by("quality_score", "doc_id").alias("quality_score"),
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        dmean("quality_score").alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# x5_tpch_q4 — order priority checking (EXISTS → semi join + grouped count)
# ---------------------------------------------------------------------------

_X5_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("x5_tpch_q4", oracle=_X5_ORACLE)
def x5_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS decorrelated to a LEFT SEMI
    join + grouped count (this testdata has no commitdate/receiptdate,
    so 'has a returned line' plays the correlated predicate). The semi
    join never materializes lineitem columns — at 100 TB the probe side
    shuffles only l_orderkey, and the quarter filter prunes the orders
    scan before the join."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    quarter = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        quarter.join(
            returned, quarter.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
