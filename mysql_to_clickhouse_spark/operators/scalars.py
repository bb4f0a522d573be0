"""§2.G — scalar function surface (the ClickHouse function library on
Spark builtins: string/regex/date/math/null/JSON/hash/array/lambda).

Everything is a JVM-side built-in inside whole-stage codegen — no
Python in the hot path. Cross-engine gotchas handled here (verified by
probe, not assumed):

- DuckDB ``dayofweek`` is Sunday=0; Spark's is Sunday=1 → subtract 1.
- DuckDB CAST(double AS INT) rounds, Spark truncates → FLOOR first.
- Transcendentals (ln/…) differ in last ulps between libm and the JVM
  → round to 6 decimals on both sides.
- Array lambda folds: both sides fold fixed-point bigints so
  accumulation is exact (list_sum on bigints / aggregate on longs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.text import tokens
from mysql_to_clickhouse_spark.plans.prefix import global_lag
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

# ---------------------------------------------------------------------------
# g1_string_core
# ---------------------------------------------------------------------------

_G1_ORACLE = """
SELECT
  doc_id,
  upper(substring(text, 1, 12)) AS head_upper,
  concat(lang, ':', source) AS lang_source,
  length(text) AS n_chars_fn,
  n_chars,
  lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
  replace(substring(text, 1, 30), ' ', '_') AS head_snake,
  trim('  ' || lang || '  ') AS lang_trim
FROM documents
ORDER BY doc_id
"""


@register("g1_string_core", oracle=_G1_ORACLE, tier="T1")
def g1_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/substring/upper/length/lpad/replace/trim (CH string core).
    length(text) is cross-checked against the stored n_chars column."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.length("text").cast("long").alias("n_chars_fn"),
        "n_chars",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.replace(
            F.substring("text", 1, 30), F.lit(" "), F.lit("_")
        ).alias("head_snake"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trim"),
    )


# ---------------------------------------------------------------------------
# g2_string_split
# ---------------------------------------------------------------------------

_G2_ORACLE = """
SELECT
  doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  string_split(text, ' ')[1] AS first_token,
  string_split(text, ' ')[-1] AS last_token
FROM documents
ORDER BY doc_id
"""


@register("g2_string_split", oracle=_G2_ORACLE)
def g2_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + token access (CH splitByChar). documents.text is
    single-space separated, so regex split == literal split."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ", -1)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    )


# ---------------------------------------------------------------------------
# g3_regex
# ---------------------------------------------------------------------------

_G3_ORACLE = """
SELECT
  doc_id,
  regexp_matches(text, 'batch') AS has_batch,
  CASE WHEN regexp_extract(text, 'p[a-z]+') = '' THEN '(none)'
       ELSE regexp_extract(text, 'p[a-z]+') END AS first_p_word
FROM documents
ORDER BY doc_id
"""


@register("g3_regex", oracle=_G3_ORACLE)
def g3_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regex match + extract (CH match/extract). No-match normalizes to
    '(none)' on both engines (Spark and DuckDB both return '')."""
    docs = load(spark, sf_dir, "documents")
    extracted = F.regexp_extract("text", "p[a-z]+", 0)
    return docs.select(
        "doc_id",
        F.col("text").rlike("batch").alias("has_batch"),
        F.when(extracted == "", F.lit("(none)")).otherwise(extracted).alias(
            "first_p_word"
        ),
    )


# ---------------------------------------------------------------------------
# g4_date_trunc — CH toStartOfDay/Hour/Month, toYYYYMM
# ---------------------------------------------------------------------------

_G4_ORACLE = """
SELECT
  event_id,
  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts_hour,
  date_trunc('day', CAST(ts AS TIMESTAMP)) AS ts_day,
  date_trunc('month', CAST(ts AS TIMESTAMP)) AS ts_month,
  strftime(CAST(ts AS TIMESTAMP), '%Y%m') AS yyyymm
FROM events
ORDER BY event_id
"""


@register("g4_date_trunc", oracle=_G4_ORACLE, tier="T1")
def g4_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp truncation to hour/day/month + the ClickHouse-idiom
    toYYYYMM partition key (the expression a5's sink partitions by)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.date_trunc("day", "ts").alias("ts_day"),
        F.date_trunc("month", "ts").alias("ts_month"),
        F.date_format("ts", "yyyyMM").alias("yyyymm"),
    )


# ---------------------------------------------------------------------------
# g5_date_parts
# ---------------------------------------------------------------------------

_G5_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INT) AS y,
  CAST(month(o_orderdate) AS INT) AS m,
  CAST(dayofmonth(o_orderdate) AS INT) AS d,
  CAST(dayofweek(o_orderdate) AS INT) AS dow,
  CAST(dayofyear(o_orderdate) AS INT) AS doy,
  CAST(quarter(o_orderdate) AS INT) AS q
FROM orders
ORDER BY o_orderkey
"""


@register("g5_date_parts", oracle=_G5_ORACLE)
def g5_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (CH toYear/toMonth/...). Spark dayofweek is
    Sunday=1, DuckDB's Sunday=0 → normalize by -1 (verified by probe)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.quarter("o_orderdate").alias("q"),
    )


# ---------------------------------------------------------------------------
# g6_date_arith
# ---------------------------------------------------------------------------

_G6_ORACLE = """
SELECT
  o_orderkey,
  o_orderdate + INTERVAL 30 DAY AS due_date,
  o_orderdate - INTERVAL 2 HOUR AS ts_minus_2h,
  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
FROM orders
ORDER BY o_orderkey
"""


@register("g6_date_arith", oracle=_G6_ORACLE)
def g6_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval add/subtract + day difference (CH addDays/dateDiff).
    Interval arithmetic keeps TimestampType (no DATE in outputs —
    engines disagree on DATE's pandas representation)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 2 HOURS")).alias("ts_minus_2h"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("long").alias("days_since_epoch_start"),
    )


# ---------------------------------------------------------------------------
# g7_math
# ---------------------------------------------------------------------------

_G7_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  round(l_quantity / 4.0, 1) AS qty_quarter,
  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
  abs(l_quantity - 25.0) AS qty_dev,
  pow(l_quantity, 2) AS qty_sq,
  round(ln(l_extendedprice), 6) AS ln_price,
  l_partkey % 7 AS pk_mod
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@register("g7_math", oracle=_G7_ORACLE)
def g7_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/pow/ln/mod. round() only on exactly-
    representable quarters (no cross-engine tie ambiguity); ln rounded
    to 6 decimals (libm vs JVM last-ulp divergence)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") / 4.0, 1).alias("qty_quarter"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        (F.col("l_partkey") % 7).alias("pk_mod"),
    )


# ---------------------------------------------------------------------------
# g8_null_funcs
# ---------------------------------------------------------------------------

_G8_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  COALESCE(NULLIF(l_returnflag, 'N'), '(kept)') AS flag_or_kept,
  CASE WHEN NULLIF(l_linestatus, 'O') IS NULL THEN 1 ELSE 0 END AS status_was_o,
  GREATEST(l_tax, l_discount) AS max_rate,
  LEAST(l_tax, l_discount) AS min_rate,
  COALESCE(NULLIF(l_quantity, 1.0), 0.0) AS qty_nonone
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@register("g8_null_funcs", oracle=_G8_ORACLE)
def g8_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL algebra (coalesce/nullif/greatest/least). The testdata has
    no NULLs, so nullif() manufactures them before they're folded back
    to sentinels — exercising null propagation end-to-end."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("(kept)")).alias(
            "flag_or_kept"
        ),
        F.when(F.nullif("l_linestatus", F.lit("O")).isNull(), 1)
        .otherwise(0)
        .alias("status_was_o"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.coalesce(F.nullif("l_quantity", F.lit(1.0)), F.lit(0.0)).alias(
            "qty_nonone"
        ),
    )


# ---------------------------------------------------------------------------
# g9_json_extract — CH JSONExtractInt on events.props
# ---------------------------------------------------------------------------

_G9_ORACLE = """
SELECT
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  COUNT(*) AS n,
  COUNT(DISTINCT user_id) AS uniq_users
FROM events
GROUP BY k
ORDER BY k
"""


@register("g9_json_extract", oracle=_G9_ORACLE)
def g9_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (CH JSONExtractInt;
    the MySQL JSON→String→query-time-extract idiom of §1.1) and an
    aggregate over the extracted key."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "user_id"
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
        
    )


# ---------------------------------------------------------------------------
# g10_hash — content hashing (CH MD5/SHA/cityHash64)
# ---------------------------------------------------------------------------

_G10_ORACLE = """
SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
FROM documents
ORDER BY doc_id
"""


@register("g10_hash", oracle=_G10_ORACLE)
def g10_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content hashes — the exact-dedup keys of i1 and the
    CDC row-fingerprint of the ETL layer. Hex strings match across
    engines byte-for-byte."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
    )


def _xxhash64_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document xxhash64 + bucket rows (the stability/range unit
    tests drive this form directly)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.xxhash64("text").alias("xx64"),
        (F.pmod(F.xxhash64("text"), F.lit(64))).alias("bucket"),
    )


_G10B_ORACLE = """
WITH fp AS (
  SELECT count(*) AS n_docs, sum(n_chars) AS s_chars FROM documents
)
-- xxhash64 itself has no DuckDB twin; the per-fixture digest of the
-- full per-row hash relation IS deterministic, so it is pinned here
-- keyed by a content fingerprint (the i30 precedent). An unknown
-- fixture yields NULLs -> loud hash mismatch, never a silent pass.
SELECT
  CAST(n_docs AS BIGINT) AS n_docs,
  CASE WHEN n_docs = 500  AND s_chars = 153156
         THEN CAST(2924637719477054298 AS BIGINT)
       WHEN n_docs = 500  AND s_chars = 149174
         THEN CAST(-8148758174859395068 AS BIGINT)
       WHEN n_docs = 5000 AND s_chars = 1485576
         THEN CAST(5469514536409025312 AS BIGINT)
  END AS xx_xor,
  CAST(CASE WHEN n_docs = 500  AND s_chars = 153156  THEN 15606
            WHEN n_docs = 500  AND s_chars = 149174  THEN 15410
            WHEN n_docs = 5000 AND s_chars = 1485576 THEN 158400
  END AS BIGINT) AS bucket_sum,
  CAST(CASE WHEN n_docs = 500  AND s_chars = 153156  THEN 64
            WHEN n_docs = 500  AND s_chars = 149174  THEN 64
            WHEN n_docs = 5000 AND s_chars = 1485576 THEN 64
  END AS BIGINT) AS n_buckets
FROM fp
"""


@register(
    "g10b_xxhash64",
    oracle=_G10B_ORACLE,
    test="tests/test_approx.py::test_xxhash64_stable_across_runs",
)
def g10b_xxhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-cryptographic 64-bit hash (CH cityHash64 analog → Spark
    xxhash64): the cheap shuffle/bucket key. DuckDB cannot compute
    xxhash64, but the digest of the per-row hash relation (bit-XOR of
    every hash, bucket mass, bucket cardinality) is deterministic —
    pinned per fixture fingerprint in the oracle (the i30 precedent),
    which catches any seed/variant drift in Spark's implementation
    loudly. Per-row stability and bucket range stay unit-tested.

    Scale: map-side hash + one 1-row aggregate; the XOR digest is
    commutative, so it combines map-side like any algebraic agg."""
    return _xxhash64_rows(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("bit_xor(xx64)").alias("xx_xor"),
        F.sum("bucket").alias("bucket_sum"),
        F.count_distinct("bucket").alias("n_buckets"),
    )


# ---------------------------------------------------------------------------
# g11_array_core
# ---------------------------------------------------------------------------

_G11_ORACLE = """
SELECT
  vec_id,
  len(embedding) AS dim,
  CAST(embedding[1] AS DOUBLE) AS first_el,
  CAST(embedding[64] AS DOUBLE) AS last_el,
  CAST(list_sort(embedding[1:8])[1] AS DOUBLE) AS min_first8
FROM embeddings
ORDER BY vec_id
"""


@register("g11_array_core", oracle=_G11_ORACLE)
def g11_array_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size/index/slice/sort (CH array core). Scalars surface as
    double (float32→float64 is exact) — arrays stay internal, scalar
    projections hash portably."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_el"),
        F.element_at("embedding", 64).cast("double").alias("last_el"),
        F.element_at(F.sort_array(F.slice("embedding", 1, 8)), 1)
        .cast("double")
        .alias("min_first8"),
    )


# ---------------------------------------------------------------------------
# g12_explode — CH arrayJoin / UNNEST
# ---------------------------------------------------------------------------

_G12_ORACLE = """
SELECT vec_id, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS el
FROM embeddings, range(64) t(i)
WHERE vec_id < 10
ORDER BY vec_id, pos
"""


@register("g12_explode", oracle=_G12_ORACLE)
def g12_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one row per array element with its 0-based index
    (CH arrayJoin). Generator runs map-side — no shuffle."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("pos", "el"))
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            F.col("el").cast("double").alias("el"),
        )
        
    )


# ---------------------------------------------------------------------------
# g13_higher_order — lambda over arrays (CH arrayMap/arrayFilter/arraySum)
# ---------------------------------------------------------------------------

_G13_ORACLE = """
SELECT
  vec_id,
  sqrt(CAST(list_sum(list_transform(embedding,
        x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0)
             AS BIGINT))) AS DOUBLE) / 1000000000.0) AS l2_norm,
  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
  CAST(len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) > 0.2)) AS BIGINT)
    AS n_large
FROM embeddings
ORDER BY vec_id
"""


@register("g13_higher_order", oracle=_G13_ORACLE)
def g13_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform/filter/aggregate lambdas: L2 norm via fixed-point fold
    (exact under any fold order) + element-predicate counts. All
    JVM-side codegen — the no-UDF way to do vector math."""
    emb = load(spark, sf_dir, "embeddings")
    sq_fixed = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * x.cast("double") * 1e9).cast("long"),
    )
    sum_sq = F.aggregate(sq_fixed, F.lit(0).cast("long"), lambda acc, y: acc + y)
    return emb.select(
        "vec_id",
        F.sqrt(sum_sq.cast("double") / 1e9).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.size(
            F.filter("embedding", lambda x: F.abs(x.cast("double")) > 0.2)
        ).cast("long").alias("n_large"),
    )


# ---------------------------------------------------------------------------
# g14_cast_fmt
# ---------------------------------------------------------------------------

_G14_ORACLE = """
SELECT
  p_partkey,
  CAST(p_size AS VARCHAR) AS size_str,
  CAST(p_size AS BIGINT) AS size_long,
  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_int,
  strftime(TIMESTAMP '1995-03-04 05:06:07', '%Y-%m-%d %H:%M:%S') AS ts_fmt,
  printf('%.1f', CAST(p_size AS DOUBLE)) AS size_fmt
FROM part
ORDER BY p_partkey
"""


@register("g14_cast_fmt", oracle=_G14_ORACLE)
def g14_cast_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix + formatting (CH toString/toInt/formatDateTime).
    double→int goes through FLOOR (DuckDB's raw cast rounds, Spark's
    truncates — probed, not assumed)."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("string").alias("size_str"),
        F.col("p_size").cast("long").alias("size_long"),
        F.floor("p_retailprice").cast("long").alias("price_int"),
        F.date_format(
            F.lit("1995-03-04 05:06:07").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_fmt"),
        F.format_string("%.1f", F.col("p_size").cast("double")).alias("size_fmt"),
    )


# ---------------------------------------------------------------------------
# g15_url_funcs — ClickHouse URL function family
# ---------------------------------------------------------------------------

_G15_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.org/' || lang || '/doc/'
           || CAST(doc_id AS VARCHAR) || '?page='
           || CAST(doc_id % 7 AS VARCHAR) || '&ref=' || source AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
                      '([a-z0-9]+)$', 1) AS tld,
       regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query_string,
       CAST(regexp_extract(url, 'page=([0-9]+)', 1) AS BIGINT) AS page_param,
       regexp_extract(url, 'ref=([a-z0-9]+)', 1) AS ref_param
FROM u
ORDER BY doc_id
"""


@register("g15_url_funcs", oracle=_G15_ORACLE)
def g15_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH URL function family (domain / topLevelDomain / path /
    queryString / extractURLParameter) — Spark-first via the built-in
    parse_url where its semantics are exact (HOST, PATH, QUERY, keyed
    parameter extraction) and regexp for the TLD; the oracle derives
    every piece with regexes only, so the check also pins parse_url's
    behavior against an independent implementation. All map-side
    JVM expressions — the URL never leaves codegen."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?page="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref="),
        F.col("source"),
    )
    u = docs.select("doc_id", url.alias("url"))
    host = F.parse_url("url", F.lit("HOST"))
    return u.select(
        "doc_id",
        "url",
        host.alias("host"),
        F.regexp_extract(host, "([a-z0-9]+)$", 1).alias("tld"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page"))
        .cast("long")
        .alias("page_param"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
    )


# ---------------------------------------------------------------------------
# g16_geo — CH geo function family (greatCircleDistance / point-in-box)
# ---------------------------------------------------------------------------

_G16_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 1700) / 10.0 - 85.0 AS lat,
         ((c_custkey * 7 + c_nationkey * 13) % 3500) / 10.0 - 175.0 AS lon
  FROM customer
)
SELECT c_custkey, lat, lon,
       round(2.0 * 6371.0 * asin(sqrt(
         sin(radians((lat - 48.8566) / 2.0)) * sin(radians((lat - 48.8566) / 2.0))
         + cos(radians(lat)) * cos(radians(48.8566))
           * sin(radians((lon - 2.3522) / 2.0)) * sin(radians((lon - 2.3522) / 2.0))
       )), 3) AS dist_km,
       (lat BETWEEN -23.5 AND 23.5) AND (lon BETWEEN 0.0 AND 90.0) AS in_box
FROM pts
ORDER BY c_custkey
"""


@register("g16_geo", oracle=_G16_ORACLE)
def g16_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH geo functions (greatCircleDistance, pointInsideBox family) as
    JVM built-ins: haversine great-circle distance to a fixed anchor
    plus a bounding-box predicate. Coordinates are derived
    deterministically from customer keys (the testdata carries no geo
    columns) with pure integer/double arithmetic so both engines
    construct bit-identical inputs.

    Cross-engine determinism: the formula is written with the SAME
    operation order on both sides; libm-vs-JVM trig can differ in the
    last ulps, so the distance is rounded to 1 m resolution (policy of
    §5.4, like g7's transcendentals). Verified to hash-match at both
    sf0.01 and sf0.1.

    Scale: pure map-side narrow projection inside whole-stage codegen —
    no shuffle, no UDF; a geo filter (in_box) would push down as a
    plain comparison on the derived columns."""
    cust = load(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 1700) / 10.0 - 85.0
    lon = ((F.col("c_custkey") * 7 + F.col("c_nationkey") * 13) % 3500) / 10.0 - 175.0
    pts = cust.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    sin_dphi = F.sin(F.radians((F.col("lat") - 48.8566) / 2.0))
    sin_dlam = F.sin(F.radians((F.col("lon") - 2.3522) / 2.0))
    havers = (
        sin_dphi * sin_dphi
        + F.cos(F.radians(F.col("lat")))
        * F.cos(F.radians(F.lit(48.8566)))
        * sin_dlam
        * sin_dlam
    )
    dist = F.round(2.0 * 6371.0 * F.asin(F.sqrt(havers)), 3)
    in_box = (
        F.col("lat").between(-23.5, 23.5) & F.col("lon").between(0.0, 90.0)
    )
    return pts.select(
        "c_custkey", "lat", "lon", dist.alias("dist_km"), in_box.alias("in_box")
    )


# ---------------------------------------------------------------------------
# g17_dict_get — CH external-dictionary lookup (dictGetOrDefault)
# ---------------------------------------------------------------------------

_G17_ORACLE = """
SELECT c_custkey,
       c_nationkey + 20 AS dict_key,
       COALESCE(n_name, 'UNKNOWN') AS dict_val
FROM customer LEFT JOIN nation ON c_nationkey + 20 = n_nationkey
"""


@register("g17_dict_get", oracle=_G17_ORACLE)
def g17_dict_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH dictGetOrDefault('nation_dict', 'n_name', key, 'UNKNOWN'): a
    point lookup into an in-memory dictionary with a default for missing
    keys (the shifted key makes 80% of lookups miss, exercising the
    default path). Spark-first: the dictionary IS a broadcast LEFT join
    — every executor holds the dict once, the lookup is a local hash
    probe in whole-stage codegen, and COALESCE supplies the default.
    No shuffle of the fact side at any scale, exactly like CH's
    per-server dictionary replica."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    key = (F.col("c_nationkey") + F.lit(20)).alias("dict_key")
    return (
        cust.select("c_custkey", key)
        .join(
            F.broadcast(nation),
            F.col("dict_key") == F.col("n_nationkey"),
            "left",
        )
        .select(
            "c_custkey",
            "dict_key",
            F.coalesce(F.col("n_name"), F.lit("UNKNOWN")).alias("dict_val"),
        )
    )


# ---------------------------------------------------------------------------
# g18_array_arith — CH arrayDifference / arrayCumSum / arrayCompact
# ---------------------------------------------------------------------------

_G18_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> CAST(length(w) AS BIGINT))
           AS lens
  FROM documents
)
SELECT doc_id,
       CAST(len(lens) AS BIGINT) AS n,
       list_aggregate(list_transform(range(1, len(lens) + 1), i ->
         CASE WHEN i = 1 THEN 0 ELSE lens[i] - lens[i - 1] END),
         'string_agg', ',') AS diff_str,
       list_aggregate(list_transform(range(1, len(lens) + 1), i ->
         list_sum(lens[1:i])), 'string_agg', ',') AS cumsum_str,
       CAST(len(list_filter(range(1, len(lens) + 1), i ->
         i = 1 OR lens[i] != lens[i - 1])) AS BIGINT) AS compact_len
FROM t
ORDER BY doc_id
"""


@register("g18_array_arith", oracle=_G18_ORACLE)
def g18_array_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH array arithmetic family on integer sequences (token lengths):
    arrayDifference (x[i] - x[i-1], leading 0), arrayCumSum (prefix
    sums), arrayCompact (collapse consecutive duplicates — its length).
    All three run per-row inside the scan stage via indexed
    higher-order lambdas — zero shuffles at any corpus size; integer
    arrays are surfaced as canonical comma strings (exact on both
    engines).

    r13: the token-length array is MATERIALIZED once per row before
    anything indexes into it. The previous form inlined the
    ``transform(split(text), length)`` expression at every
    ``element_at`` site, so each array access re-split the document and
    re-measured every token — O(tokens²) work per row — and the prefix
    sums additionally re-aggregated every slice. One projected ``lens``
    column + an O(n) struct-accumulator fold for the prefix sums makes
    all three outputs linear per row: 0.83 s → 0.17 s warm over the
    500-doc sf0.01 fixture, same values (hash-checked)."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.transform(tokens("text"), lambda w: F.length(w).cast("long")).alias(
            "lens"
        ),
    )
    lens = F.col("lens")
    # i is 0-based; element_at is 1-based → element_at(lens, i) IS the
    # predecessor of x at position i (guard i=0 via greatest to keep
    # element_at's argument legal on every row)
    diff = F.transform(
        lens,
        lambda x, i: F.when(i == 0, F.lit(0).cast("long")).otherwise(
            x - F.element_at(lens, F.greatest(i, F.lit(1)))
        ),
    )
    # Prefix sums in ONE O(n) fold (struct accumulator: running total +
    # array-so-far) instead of transform-of-slice-aggregates (which
    # re-summed every prefix). Values are identical integer sums; the
    # oracle keeps the per-prefix list_sum form, so the equivalence is
    # hash-checked every drive.
    cumsum = F.aggregate(
        lens,
        F.struct(
            F.lit(0).cast("long").alias("s"),
            F.array().cast("array<long>").alias("out"),
        ),
        lambda acc, y: F.struct(
            (acc["s"] + y).alias("s"),
            F.array_append(acc["out"], acc["s"] + y).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    keep = F.filter(
        F.sequence(F.lit(1), F.size(lens)),
        lambda i: (i == 1)
        | (F.element_at(lens, i) != F.element_at(lens, F.greatest(i - 1, F.lit(1)))),
    )
    return base.select(
        "doc_id",
        F.size(lens).cast("long").alias("n"),
        F.array_join(F.transform(diff, lambda d: d.cast("string")), ",").alias(
            "diff_str"
        ),
        F.array_join(
            F.transform(cumsum, lambda s: s.cast("string")), ","
        ).alias("cumsum_str"),
        F.size(keep).cast("long").alias("compact_len"),
    )


# ---------------------------------------------------------------------------
# g19_bit_scalars — CH bitCount/bitShiftLeft/bitShiftRight/bitTest family
# ---------------------------------------------------------------------------

_G19_ORACLE = """
SELECT event_id,
       CAST(bit_count(user_id) AS INT) AS popcnt,
       user_id << 3 AS shl3,
       user_id >> 2 AS shr2,
       xor(user_id, 2863311530) AS xor_mask,
       user_id & 255 AS low_byte,
       user_id | 1 AS set_lsb,
       (user_id >> 4) & 1 = 1 AS bit4_set
FROM events
WHERE event_type = 'click'
ORDER BY event_id
"""


@register("g19_bit_scalars", oracle=_G19_ORACLE)
def g19_bit_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH bit-manipulation scalars (bitCount, bitShiftLeft/Right,
    bitXor/And/Or, bitTest) over the int64 key domain — the building
    blocks the engine's own hash/bucket operators (g10, a9, i2c) lean
    on, surfaced as user-facing functions. Integer-exact on both
    engines, map-only, whole-stage-codegen'd — zero shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    u = F.col("user_id")
    return ev.select(
        "event_id",
        F.bit_count(u).alias("popcnt"),
        F.shiftleft(u, 3).cast("bigint").alias("shl3"),
        F.shiftright(u, 2).cast("bigint").alias("shr2"),
        u.bitwiseXOR(F.lit(2863311530)).alias("xor_mask"),
        u.bitwiseAND(F.lit(255)).alias("low_byte"),
        u.bitwiseOR(F.lit(1)).alias("set_lsb"),
        (F.shiftright(u, 4).bitwiseAND(F.lit(1)) == 1).alias("bit4_set"),
    )


# ---------------------------------------------------------------------------
# g20_codec_funcs — CH base64Encode/base64Decode/hex/unhex
# ---------------------------------------------------------------------------

_G20_ORACLE = """
SELECT doc_id,
       base64(encode(lang)) AS lang_b64,
       decode(from_base64(base64(encode(lang)))) AS lang_roundtrip,
       to_hex(encode(source)) AS source_hex,
       upper(to_hex(encode(lang))) AS lang_hex_upper
FROM documents
ORDER BY doc_id
"""


@register("g20_codec_funcs", oracle=_G20_ORACLE)
def g20_codec_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH base64Encode / base64Decode / hex / unhex: the binary-codec
    scalar family (ubiquitous in replication pipelines moving opaque
    payloads through text transports). Round-trip asserted in-row
    (encode→decode returns the original), hex emitted in both engines'
    canonical casings. Map-only, codegen'd, zero shuffle."""
    docs = load(spark, sf_dir, "documents")
    b64 = F.base64(F.col("lang").cast("binary"))
    return docs.select(
        "doc_id",
        b64.alias("lang_b64"),
        F.unbase64(b64).cast("string").alias("lang_roundtrip"),
        F.lower(F.hex(F.col("source").cast("binary"))).alias("source_hex"),
        F.hex(F.col("lang").cast("binary")).alias("lang_hex_upper"),
    )


# ---------------------------------------------------------------------------
# g21_array_join_left — CH LEFT ARRAY JOIN (empty arrays keep their row)
# ---------------------------------------------------------------------------

_G21_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), w -> length(w) >= 8) AS longw
  FROM documents
), u AS (
  SELECT doc_id,
         CASE WHEN len(longw) = 0 THEN [NULL] ELSE longw END AS words
  FROM t
)
SELECT doc_id, UNNEST(words) AS word
FROM u
ORDER BY doc_id, word
"""


@register("g21_array_join_left", oracle=_G21_ORACLE)
def g21_array_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LEFT ARRAY JOIN`` semantics: unnesting must KEEP rows whose
    array is empty (one row with a NULL element) — the variant plain
    arrayJoin/explode silently drops, losing every document with no
    long words from downstream per-doc joins. Spark spells it
    explode_outer; DuckDB has no outer UNNEST, so the oracle states the
    semantics from first principles (empty → [NULL]). Map-side only —
    a Generate node, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    longw = F.filter(tokens("text"), lambda w: F.length(w) >= 8)
    return docs.select(
        "doc_id", F.explode_outer(longw).alias("word")
    )


# ---------------------------------------------------------------------------
# g22_string_search — CH position/countSubstrings/multiSearchAny family
# ---------------------------------------------------------------------------

_G22_ORACLE = """
SELECT doc_id,
       CAST(instr(text, 'an') AS BIGINT) AS pos_an,
       CAST((length(text) - length(replace(text, 'er', ''))) / 2
            AS BIGINT) AS cnt_er,
       CAST(CASE WHEN contains(text, 'ing') OR contains(text, 'zzzz')
                  OR contains(text, 'qu') THEN 1 ELSE 0 END
            AS BIGINT) AS multi_any,
       CAST(CASE WHEN text LIKE 'the %' THEN 1 ELSE 0 END
            AS BIGINT) AS starts_the,
       CAST(CASE WHEN text LIKE '%s' THEN 1 ELSE 0 END
            AS BIGINT) AS ends_s
FROM documents
ORDER BY doc_id
"""


@register("g22_string_search", oracle=_G22_ORACLE)
def g22_string_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH string-search family: ``position`` (instr), ``countSubstrings``
    (the length-difference identity — zero allocation, one pass),
    ``multiSearchAny`` (OR of contains), ``startsWith``/``endsWith``.
    All JVM builtins inside whole-stage codegen; map-only — the shape
    that costs one scan at any size."""
    docs = load(spark, sf_dir, "documents")
    cnt_er = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("er"), F.lit(""))))
        / 2
    ).cast("long")
    multi = (
        F.col("text").contains("ing")
        | F.col("text").contains("zzzz")
        | F.col("text").contains("qu")
    )
    return docs.select(
        "doc_id",
        F.instr("text", "an").cast("long").alias("pos_an"),
        cnt_er.alias("cnt_er"),
        F.when(multi, 1).otherwise(0).cast("long").alias("multi_any"),
        F.when(F.col("text").startswith("the "), 1)
        .otherwise(0)
        .cast("long")
        .alias("starts_the"),
        F.when(F.col("text").endswith("s"), 1)
        .otherwise(0)
        .cast("long")
        .alias("ends_s"),
    )


# ---------------------------------------------------------------------------
# g23_ipv4 — CH IPv4NumToString / IPv4StringToNum round trip
# ---------------------------------------------------------------------------

# A deterministic synthetic IPv4 per customer (Knuth multiplicative
# hash mod 2^32) — pure int64 arithmetic, bit-identical by definition.
_G23_ORACLE = """
WITH ip AS (
  SELECT c_custkey, (c_custkey * 2654435761) % 4294967296 AS ipnum
  FROM customer
), oct AS (
  SELECT c_custkey, ipnum,
         (ipnum // 16777216) % 256 AS b0,
         (ipnum // 65536) % 256 AS b1,
         (ipnum // 256) % 256 AS b2,
         ipnum % 256 AS b3
  FROM ip
)
SELECT c_custkey, ipnum,
       concat(CAST(b0 AS VARCHAR), '.', CAST(b1 AS VARCHAR), '.',
              CAST(b2 AS VARCHAR), '.', CAST(b3 AS VARCHAR)) AS ip_str,
       CAST(b0 * 16777216 + b1 * 65536 + b2 * 256 + b3 AS BIGINT)
         AS ipnum_roundtrip,
       CAST(CASE WHEN ipnum >= 2886729728 AND ipnum < 2887778304
                 THEN 1 ELSE 0 END AS BIGINT) AS is_rfc1918_172
FROM oct
ORDER BY c_custkey
"""


@register("g23_ipv4", oracle=_G23_ORACLE)
def g23_ipv4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``IPv4NumToString``/``IPv4StringToNum`` and a subnet test
    (the 172.16.0.0/12 private range as a numeric band) — the network
    scalar family, as pure int64 arithmetic + concat. Map-only."""
    cust = load(spark, sf_dir, "customer")
    ip = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * F.lit(2654435761)) % F.lit(4294967296)).alias("ipnum"),
    )
    oct_ = ip.select(
        "c_custkey",
        "ipnum",
        (F.expr("ipnum div 16777216") % 256).alias("b0"),
        (F.expr("ipnum div 65536") % 256).alias("b1"),
        (F.expr("ipnum div 256") % 256).alias("b2"),
        (F.col("ipnum") % 256).alias("b3"),
    )
    return oct_.select(
        "c_custkey",
        "ipnum",
        F.concat_ws(
            ".",
            F.col("b0").cast("string"),
            F.col("b1").cast("string"),
            F.col("b2").cast("string"),
            F.col("b3").cast("string"),
        ).alias("ip_str"),
        (
            F.col("b0") * 16777216 + F.col("b1") * 65536 + F.col("b2") * 256
            + F.col("b3")
        )
        .cast("long")
        .alias("ipnum_roundtrip"),
        F.when(
            (F.col("ipnum") >= 2886729728) & (F.col("ipnum") < 2887778304), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("is_rfc1918_172"),
    )


# ---------------------------------------------------------------------------
# g24_transform_dict — CH transform(x, [from...], [to...], default)
# ---------------------------------------------------------------------------

_G24_ORACLE = """
SELECT c_mktsegment,
       CAST(CASE c_mktsegment
            WHEN 'AUTOMOBILE' THEN 10
            WHEN 'BUILDING' THEN 20
            WHEN 'FURNITURE' THEN 30
            ELSE 0 END AS BIGINT) AS tier,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("g24_transform_dict", oracle=_G24_ORACLE, tier="T3")
def g24_transform_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``transform(x, [from], [to], default)``: a literal value
    remap with a default for unmapped keys. Engine form is a map
    literal + element_at + coalesce (one codegen'd expression — not a
    join); the oracle states the same mapping as a CASE. Map-only +
    tiny hash agg."""
    cust = load(spark, sf_dir, "customer")
    mapping = F.create_map(
        F.lit("AUTOMOBILE"), F.lit(10),
        F.lit("BUILDING"), F.lit(20),
        F.lit("FURNITURE"), F.lit(30),
    )
    tier = F.coalesce(F.element_at(mapping, F.col("c_mktsegment")), F.lit(0))
    return (
        cust.select("c_mktsegment", tier.cast("long").alias("tier"))
        .groupBy("c_mktsegment", "tier")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("c_mktsegment", "tier", "n")
    )


# ---------------------------------------------------------------------------
# g25_bar — CH bar(x, min, max, width): ASCII sparkline rendering
# ---------------------------------------------------------------------------

_G25_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events
  GROUP BY event_type, day
)
SELECT event_type, CAST(day AS VARCHAR) AS day_str, cnt,
       repeat('#', CAST(FLOOR(cnt / 10.0) AS INT)) AS bar
FROM daily
ORDER BY event_type, day_str
"""


@register("g25_bar", oracle=_G25_ORACLE, tier="T3")
def g25_bar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``bar(x, 0, max, width)``: render a per-(type, day) activity
    bar at 10 events per '#'. FLOOR (not round) so no half-way ties
    exist; repeat() is a builtin on both engines. The render is a
    map-only decoration over a small aggregate."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return daily.select(
        "event_type",
        F.col("day").cast("string").alias("day_str"),
        "cnt",
        F.repeat(F.lit("#"), F.floor(F.col("cnt") / 10.0).cast("int")).alias("bar"),
    )


# ---------------------------------------------------------------------------
# g26_geo_distance — CH greatCircleDistance (haversine)
# ---------------------------------------------------------------------------

# Coordinates are deterministic int-derived synthetics; the only
# non-correctly-rounded IEEE ops (sin/cos/asin) are rounded at 9 digits
# immediately (the i6/d41 precedent); sqrt and * / are exact-rounded.
_G26_DEG2RAD = "0.017453292519943295"

_G26_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey,
         CAST((c_custkey % 120) - 60 + 0.5 AS DOUBLE) AS lat1,
         CAST(((c_custkey * 7) % 360) - 180 + 0.5 AS DOUBLE) AS lon1,
         CAST((c_nationkey * 4) - 50 + 0.5 AS DOUBLE) AS lat2,
         CAST(((c_nationkey * 29) % 360) - 180 + 0.5 AS DOUBLE) AS lon2
  FROM customer
), rad AS (
  SELECT c_custkey, lat1, lon1, lat2, lon2,
         ROUND(SIN((lat2 - lat1) * {_G26_DEG2RAD} / 2.0), 9) AS s_dlat,
         ROUND(SIN((lon2 - lon1) * {_G26_DEG2RAD} / 2.0), 9) AS s_dlon,
         ROUND(COS(lat1 * {_G26_DEG2RAD}), 9) AS c_lat1,
         ROUND(COS(lat2 * {_G26_DEG2RAD}), 9) AS c_lat2
  FROM pts
), hav AS (
  SELECT c_custkey, lat1, lon1, lat2, lon2,
         s_dlat * s_dlat + c_lat1 * c_lat2 * s_dlon * s_dlon AS a
  FROM rad
)
SELECT c_custkey, lat1, lon1, lat2, lon2,
       2.0 * 6371.0 * ROUND(ASIN(SQRT(a)), 9) AS dist_km
FROM hav
ORDER BY c_custkey
"""


@register("g26_geo_distance", oracle=_G26_ORACLE)
def g26_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``greatCircleDistance``: haversine km between two synthetic
    points per customer (coordinates derived from keys by integer
    arithmetic, so inputs are bit-identical on both engines). Each
    transcendental is rounded at 9 digits the moment it is produced —
    libm sin/cos/asin are not correctly rounded, sqrt and arithmetic
    are. Map-only; one scan at any scale."""
    cust = load(spark, sf_dir, "customer")
    d2r = float(_G26_DEG2RAD)
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 120) - 60 + 0.5).cast("double").alias("lat1"),
        (((F.col("c_custkey") * 7) % 360) - 180 + 0.5).cast("double").alias("lon1"),
        ((F.col("c_nationkey") * 4) - 50 + 0.5).cast("double").alias("lat2"),
        (((F.col("c_nationkey") * 29) % 360) - 180 + 0.5)
        .cast("double")
        .alias("lon2"),
    )
    rad = pts.select(
        "*",
        F.round(F.sin((F.col("lat2") - F.col("lat1")) * d2r / 2.0), 9).alias("s_dlat"),
        F.round(F.sin((F.col("lon2") - F.col("lon1")) * d2r / 2.0), 9).alias("s_dlon"),
        F.round(F.cos(F.col("lat1") * d2r), 9).alias("c_lat1"),
        F.round(F.cos(F.col("lat2") * d2r), 9).alias("c_lat2"),
    )
    a = (
        F.col("s_dlat") * F.col("s_dlat")
        + F.col("c_lat1") * F.col("c_lat2") * F.col("s_dlon") * F.col("s_dlon")
    )
    return rad.select(
        "c_custkey",
        "lat1",
        "lon1",
        "lat2",
        "lon2",
        (2.0 * 6371.0 * F.round(F.asin(F.sqrt(a)), 9)).alias("dist_km"),
    )


# ---------------------------------------------------------------------------
# g27_array_setops — CH arrayIntersect / arrayExcept / arrayUnion
# ---------------------------------------------------------------------------

_G27_ORACLE = """
WITH w AS (
  SELECT doc_id,
         list_sort(list_distinct(list_filter(
           string_split(text, ' '), x -> length(x) >= 6))) AS big_words,
         list_sort(list_distinct(list_filter(
           string_split(text, ' '), x -> contains(x, 'a')))) AS a_words
  FROM documents
)
SELECT doc_id,
       COALESCE(array_to_string(list_sort(list_intersect(big_words, a_words)),
                       ','), '') AS both_sets,
       COALESCE(array_to_string(list_sort(list_filter(big_words,
                       x -> NOT list_contains(a_words, x))), ','), '') AS only_big,
       CAST(length(list_distinct(list_concat(big_words, a_words)))
            AS BIGINT) AS union_n
FROM w
ORDER BY doc_id
"""


@register("g27_array_setops", oracle=_G27_ORACLE)
def g27_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``arrayIntersect``/``arrayExcept`` (via filter)/``arrayUnion``
    set algebra over per-document word sets. Set results are sorted so
    the element order both engines happen to produce is normalized out.
    Higher-order builtins, map-only, no explode — the array never
    leaves the row."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    big = F.array_sort(
        F.array_distinct(F.filter(words, lambda w: F.length(w) >= 6))
    )
    aw = F.array_sort(
        F.array_distinct(F.filter(words, lambda w: w.contains("a")))
    )
    w = docs.select("doc_id", big.alias("big_words"), aw.alias("a_words"))
    return w.select(
        "doc_id",
        F.concat_ws(
            ",", F.array_sort(F.array_intersect("big_words", "a_words"))
        ).alias("both_sets"),
        F.concat_ws(
            ",", F.array_sort(F.array_except("big_words", "a_words"))
        ).alias("only_big"),
        F.size(F.array_distinct(F.concat("big_words", "a_words")))
        .cast("long")
        .alias("union_n"),
    )


# ---------------------------------------------------------------------------
# g28_format_readable — CH formatReadableSize: bytes → human string
# ---------------------------------------------------------------------------

# printf('%.2f') is NOT portable: n/2^k can land exactly on a decimal
# tie (171136/1024 = 167.125 → Java HALF_UP says .13, C half-even says
# .12 — measured). So the render is pure integer arithmetic: truncate
# at 2 decimals via FLOOR(x·100) and typeset digits with lpad — no
# float formatting anywhere.
_G28_ORACLE = """
WITH b AS (
  SELECT c_custkey, c_custkey * 1337 AS n_bytes FROM customer
), v AS (
  SELECT c_custkey, n_bytes,
         CASE
           WHEN n_bytes < 1024 THEN CAST(n_bytes AS DOUBLE)
           WHEN n_bytes < 1048576 THEN CAST(n_bytes AS DOUBLE) / 1024.0
           WHEN n_bytes < 1073741824
             THEN CAST(n_bytes AS DOUBLE) / 1048576.0
           ELSE CAST(n_bytes AS DOUBLE) / 1073741824.0
         END AS scaled,
         CASE
           WHEN n_bytes < 1024 THEN 'B'
           WHEN n_bytes < 1048576 THEN 'KiB'
           WHEN n_bytes < 1073741824 THEN 'MiB'
           ELSE 'GiB'
         END AS unit
  FROM b
), c AS (
  SELECT c_custkey, n_bytes, unit,
         CAST(FLOOR(scaled * 100.0) AS BIGINT) AS cents
  FROM v
)
SELECT c_custkey, n_bytes,
       concat(CAST(cents // 100 AS VARCHAR), '.',
              lpad(CAST(cents % 100 AS VARCHAR), 2, '0'), ' ',
              unit) AS readable
FROM c
ORDER BY c_custkey
"""


@register("g28_format_readable", oracle=_G28_ORACLE, tier="T3")
def g28_format_readable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``formatReadableSize(x)``: render byte counts at the right
    binary unit with two decimals. printf('%.2f') is runtime-dependent
    on exact decimal ties (Java HALF_UP vs C half-even — n/2^k values
    like 167.125 DO hit them), so the digits are typeset from an
    integer FLOOR(x·100): truncation has no ties, lpad has no locale.
    Map-only."""
    cust = load(spark, sf_dir, "customer")
    b = cust.select(
        "c_custkey", (F.col("c_custkey") * 1337).alias("n_bytes")
    )
    nb = F.col("n_bytes").cast("double")
    scaled = (
        F.when(F.col("n_bytes") < 1024, nb)
        .when(F.col("n_bytes") < 1048576, nb / 1024.0)
        .when(F.col("n_bytes") < 1073741824, nb / 1048576.0)
        .otherwise(nb / 1073741824.0)
    )
    unit = (
        F.when(F.col("n_bytes") < 1024, F.lit("B"))
        .when(F.col("n_bytes") < 1048576, F.lit("KiB"))
        .when(F.col("n_bytes") < 1073741824, F.lit("MiB"))
        .otherwise(F.lit("GiB"))
    )
    cents = F.floor(scaled * 100.0).cast("long")
    readable = F.concat(
        F.floor(cents / 100).cast("long").cast("string"),
        F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
        F.lit(" "),
        unit,
    )
    return b.select("c_custkey", "n_bytes", readable.alias("readable"))


# ---------------------------------------------------------------------------
# g29_point_in_polygon — CH pointInPolygon: ray-casting, one source of truth
# ---------------------------------------------------------------------------

# The polygon is ONE Python literal; both the Spark expression tree and
# the oracle SQL are generated from it edge by edge, so the two engines
# run the same crossing tests in the same order — they cannot drift.
_G29_POLY = [(0, 0), (40, 0), (50, 30), (20, 50), (-10, 25)]


def _g29_edge_sql(px: str, py: str) -> list[str]:
    terms = []
    n = len(_G29_POLY)
    for i in range(n):
        x1, y1 = _G29_POLY[i]
        x2, y2 = _G29_POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1} > {py}) <> ({y2} > {py})) AND "
            f"(CAST({px} AS DOUBLE) < CAST({x2 - x1} AS DOUBLE) * "
            f"({py} - {y1}) / {float(y2 - y1)!r} + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    return terms


_G29_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * 13) % 80 - 15 AS px,
         (c_custkey * 29) % 70 - 10 AS py
  FROM customer
)
SELECT c_custkey, px, py,
       CAST(({' + '.join(_g29_edge_sql('px', 'py'))}) % 2 AS BIGINT)
         AS inside
FROM pts
ORDER BY c_custkey
"""


@register("g29_point_in_polygon", oracle=_G29_ORACLE)
def g29_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``pointInPolygon((x,y), [...])``: ray-casting against a fixed
    pentagon, unrolled edge by edge from a single polygon literal that
    also generates the oracle SQL — the crossing parity is a sum of
    integer CASE terms plus one fixed-order IEEE division per edge.

    Scale: map-only, codegen'd — a k-vertex polygon costs k expression
    terms per row, no join, no UDF. (A polygon table would instead
    broadcast-join and aggregate the same terms.)"""
    cust = load(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 13) % 80 - 15).alias("px"),
        ((F.col("c_custkey") * 29) % 70 - 10).alias("py"),
    )
    crossing = " + ".join(_g29_edge_sql("px", "py"))
    return pts.select(
        "c_custkey",
        "px",
        "py",
        F.expr(f"CAST(({crossing}) % 2 AS BIGINT)").alias("inside"),
    )


# ---------------------------------------------------------------------------
# g30_array_enumerate — CH arrayEnumerateUniq: per-element occurrence index
# ---------------------------------------------------------------------------

_G30_ORACLE = """
WITH u AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, word,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id, word ORDER BY pos)
            AS BIGINT) AS occ_idx
FROM u
ORDER BY doc_id, pos
"""


@register("g30_array_enumerate", oracle=_G30_ORACLE)
def g30_array_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``arrayEnumerateUniq``: for every token position, its
    occurrence ordinal among equal tokens so far (1st 'the', 2nd
    'the', ...) — the primitive behind de-duplicating repeated
    n-grams while keeping first occurrences.

    Scale: posexplode + one window partitioned by (doc, word) — the
    shuffle key is fine-grained, so skew is bounded by the hottest
    single token within one document, not corpus-wide."""
    docs = load(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "word"),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "word")
    w = Window.partitionBy("doc_id", "word").orderBy("pos")
    return u.select(
        "doc_id",
        "pos",
        "word",
        F.row_number().over(w).cast("long").alias("occ_idx"),
    )


# ---------------------------------------------------------------------------
# g31_hamming_fingerprint — bitHammingDistance over content fingerprints
# ---------------------------------------------------------------------------

_G31_ORACLE = """
WITH fp AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT) AS fingerprint
  FROM documents
), seq AS (
  SELECT doc_id, fingerprint,
         LAG(fingerprint) OVER (ORDER BY doc_id) AS prev_fp
  FROM fp
)
SELECT doc_id, fingerprint,
       CAST(CASE WHEN prev_fp IS NULL THEN -1
                 ELSE bit_count(xor(fingerprint, prev_fp)) END AS BIGINT)
         AS hamming_prev
FROM seq
ORDER BY doc_id
"""


@register("g31_hamming_fingerprint", oracle=_G31_ORACLE, tier="T3")
def g31_hamming_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``bitHammingDistance`` (the tupleHammingDistance/simhash
    comparison primitive) on md5-derived 48-bit content fingerprints:
    XOR then popcount, here between consecutive documents — the
    building block i2c's simhash dedup uses with xxhash fingerprints
    (rows-only there; this states the same algebra hash-checkably).

    Scale: fingerprinting is map-only; the neighbor lag runs as the
    two-phase boundary-carry form (plans/prefix.py global_lag) — local
    lag inside range partitions plus 32 carried boundary values — so
    the catalog order never funnels into a single-partition window
    (pair generation at corpus scale still goes through i2c's banded
    buckets instead)."""
    docs = load(spark, sf_dir, "documents")
    fp = F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast("long")
    seq = global_lag(
        docs.select("doc_id", fp.alias("fingerprint")),
        ["doc_id"],
        "fingerprint",
        out_col="prev_fp",
    )
    ham = F.when(F.col("prev_fp").isNull(), F.lit(-1)).otherwise(
        F.bit_count(F.expr("fingerprint ^ prev_fp"))
    )
    return seq.select(
        "doc_id", "fingerprint", ham.cast("long").alias("hamming_prev")
    )


# ---------------------------------------------------------------------------
# g32_time_bucket — CH toStartOfInterval(ts, INTERVAL 15 MINUTE)
# ---------------------------------------------------------------------------

_G32_ORACLE = """
WITH b AS (
  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) * 900000000
           AS bucket_us,
         event_type, value
  FROM events
)
SELECT bucket_us, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS v_min, MAX(value) AS v_max
FROM b
GROUP BY bucket_us, event_type
ORDER BY bucket_us, event_type
"""


@register("g32_time_bucket", oracle=_G32_ORACLE)
def g32_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``toStartOfInterval(ts, INTERVAL 15 MINUTE)`` / ``
    toStartOfFifteenMinutes``: arbitrary-width time bucketing by pure
    integer µs arithmetic (div·mul) — no calendar library involved, so
    the bucket edge is engine- and timezone-proof by construction (the
    calendar truncations are g4's). The 15-min grain aggregate is the
    monitoring-dashboard workhorse between g4's hour and h1's windows.

    Scale: map-only bucket id + map-side-combinable aggregate; the
    bucket expression is also the natural sink partition key for a
    telemetry table."""
    ev = load(spark, sf_dir, "events")
    bucket = (F.expr("unix_micros(ts) div 900000000") * 900000000).alias(
        "bucket_us"
    )
    return (
        ev.select(bucket, "event_type", "value")
        .groupBy("bucket_us", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
        .select("bucket_us", "event_type", "n", "v_min", "v_max")
    )


# ---------------------------------------------------------------------------
# g33_iso_week — CH toISOWeek/toISOYear (the week-boundary minefield)
# ---------------------------------------------------------------------------

_G33_ORACLE = """
SELECT o_orderkey,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
       concat(CAST(isoyear(o_orderdate) AS VARCHAR), '-W',
              lpad(CAST(weekofyear(o_orderdate) AS VARCHAR), 2, '0'))
         AS iso_label
FROM orders
ORDER BY o_orderkey
"""


@register("g33_iso_week", oracle=_G33_ORACLE, tier="T3")
def g33_iso_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``toISOWeek``/``toISOYear``: ISO-8601 week numbering, where
    Jan 1 can belong to week 52 of the PREVIOUS iso-year — the
    week-boundary minefield every weekly report steps on. Both engines
    implement ISO semantics (verified by probe: 2023-01-01 → 2022-W52
    on both); the composite label is the partition key a weekly rollup
    sinks under.

    Scale: map-only calendar arithmetic in codegen."""
    orders = load(spark, sf_dir, "orders")
    iso_week = F.weekofyear("o_orderdate").cast("long")
    iso_year = F.expr("extract(YEAROFWEEK FROM o_orderdate)").cast("long")
    return orders.select(
        "o_orderkey",
        iso_week.alias("iso_week"),
        iso_year.alias("iso_year"),
        F.concat(
            iso_year.cast("string"),
            F.lit("-W"),
            F.lpad(iso_week.cast("string"), 2, "0"),
        ).alias("iso_label"),
    )


# ---------------------------------------------------------------------------
# g34_edit_distance — CH editDistance/levenshteinDistance
# ---------------------------------------------------------------------------

_G34_ORACLE = """
SELECT a.n_name AS name_a, b.n_name AS name_b,
       CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS edit_dist,
       CAST(CASE WHEN levenshtein(a.n_name, b.n_name) <= 3
                 THEN levenshtein(a.n_name, b.n_name) ELSE -1 END
            AS BIGINT) AS bounded_dist,
       levenshtein(a.n_name, b.n_name) <= 3 AS is_near
FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
ORDER BY name_a, name_b
"""


@register("g34_edit_distance", oracle=_G34_ORACLE, tier="T3")
def g34_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``editDistance(a, b)`` (levenshteinDistance): pairwise edit
    distance over nation-name pairs, plus the BOUNDED form — Spark 4's
    3-arg ``levenshtein(a, b, k)`` returns -1 past the threshold and
    stops filling the DP band, the fuzzy-match idiom (CH users pair
    editDistance with a <= k filter; the bounded kernel is how that
    filter should execute). The oracle states the bounded form as the
    equivalent CASE.

    Scale: the pair generator here is a bounded self-join on a tiny
    dim; in a real fuzzy-dedup the pair source is a blocked candidate
    set (i2's LSH), and this scalar is the per-pair verifier — map-side
    codegen, O(k·min(len)) per pair for the banded form."""
    nation = load(spark, sf_dir, "nation")
    a = nation.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .select(
            "name_a",
            "name_b",
            dist.cast("long").alias("edit_dist"),
            F.levenshtein("name_a", "name_b", 3).cast("long").alias("bounded_dist"),
            (dist <= 3).alias("is_near"),
        )
    )


# ---------------------------------------------------------------------------
# g35_readable_timedelta — CH formatReadableTimeDelta
# ---------------------------------------------------------------------------

# All-integer div/mod decomposition + string assembly; singular/plural
# via CASE. Nothing float touches the hash.
_G35_ORACLE = """
WITH d AS (
  SELECT event_id,
         (epoch_us(CAST(ts AS TIMESTAMP))
          - epoch_us(TIMESTAMP '2024-01-01')) // 1000000 AS secs
  FROM events
), p AS (
  SELECT event_id, secs,
         secs // 86400 AS dd, (secs % 86400) // 3600 AS hh,
         (secs % 3600) // 60 AS mm, secs % 60 AS ss
  FROM d
)
SELECT event_id, secs,
       concat(
         CAST(dd AS VARCHAR), CASE WHEN dd = 1 THEN ' day, ' ELSE ' days, ' END,
         CAST(hh AS VARCHAR), CASE WHEN hh = 1 THEN ' hour, ' ELSE ' hours, ' END,
         CAST(mm AS VARCHAR),
         CASE WHEN mm = 1 THEN ' minute, ' ELSE ' minutes, ' END,
         CAST(ss AS VARCHAR), CASE WHEN ss = 1 THEN ' second' ELSE ' seconds' END
       ) AS readable
FROM p
ORDER BY event_id
"""


@register("g35_readable_timedelta", oracle=_G35_ORACLE, tier="T3")
def g35_readable_timedelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``formatReadableTimeDelta(sec)``: seconds-since-epoch-start
    rendered as '3 days, 4 hours, 5 minutes, 6 seconds', with proper
    singular forms — the ops-dashboard 'replication lag' renderer.
    Pure integer div/mod plus string concat; no float ever enters the
    output, so the hash is trivially portable.

    Scale: map-only codegen."""
    ev = load(spark, sf_dir, "events")
    secs = F.expr(
        "(unix_micros(ts) - unix_micros(CAST('2024-01-01' AS TIMESTAMP)))"
        " div 1000000"
    )
    p = ev.select("event_id", secs.alias("secs")).selectExpr(
        "event_id",
        "secs",
        "secs div 86400 AS dd",
        "(secs % 86400) div 3600 AS hh",
        "(secs % 3600) div 60 AS mm",
        "secs % 60 AS ss",
    )

    def unit(col: str, name: str, tail: str = ", ") -> F.Column:
        return F.concat(
            F.col(col).cast("string"),
            F.when(F.col(col) == 1, f" {name}{tail}").otherwise(f" {name}s{tail}"),
        )

    return p.select(
        "event_id",
        "secs",
        F.concat(
            unit("dd", "day"),
            unit("hh", "hour"),
            unit("mm", "minute"),
            unit("ss", "second", tail=""),
        ).alias("readable"),
    )


# ---------------------------------------------------------------------------
# g36_date_names — CH monthName/dateName (weekday names)
# ---------------------------------------------------------------------------

_G36_ORACLE = """
SELECT o_orderkey,
       monthname(o_orderdate) AS month_name,
       dayname(o_orderdate) AS day_name,
       concat(dayname(o_orderdate), ', ',
              monthname(o_orderdate), ' ',
              CAST(EXTRACT(day FROM o_orderdate) AS VARCHAR)) AS pretty
FROM orders
ORDER BY o_orderkey
"""


@register("g36_date_names", oracle=_G36_ORACLE, tier="T3")
def g36_date_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``monthName``/``dateName('weekday', ...)``: English calendar
    names (both engines' defaults are English month/day names — probed,
    not assumed) plus the composed report label. The session TZ is
    pinned UTC at load(), so the instant→calendar mapping matches the
    oracle's naive timestamps under any host TZ.

    Scale: map-only calendar formatting in codegen."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "MMMM").alias("month_name"),
        F.date_format("o_orderdate", "EEEE").alias("day_name"),
        F.concat(
            F.date_format("o_orderdate", "EEEE"),
            F.lit(", "),
            F.date_format("o_orderdate", "MMMM"),
            F.lit(" "),
            F.dayofmonth("o_orderdate").cast("string"),
        ).alias("pretty"),
    )


# ---------------------------------------------------------------------------
# g37_multi_array_join — CH ARRAY JOIN arr1, arr2 (lockstep expansion)
# ---------------------------------------------------------------------------

# Both arrays derive from the same token list, so lengths are equal by
# construction and the lockstep (not cartesian) semantics are the whole
# point: position i of each array lands on the same output row.
_G37_ORACLE = """
WITH t AS (
  SELECT doc_id,
         string_split(text, ' ')[1:8] AS toks,
         list_transform(string_split(text, ' ')[1:8], s -> length(s)) AS lens
  FROM documents
)
SELECT doc_id, CAST(i AS BIGINT) AS pos,
       toks[i] AS token, CAST(lens[i] AS BIGINT) AS token_len
FROM t, unnest(generate_series(1, len(toks))) AS u(i)
ORDER BY doc_id, pos
"""


@register("g37_multi_array_join", oracle=_G37_ORACLE, tier="T3")
def g37_multi_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``ARRAY JOIN arr1, arr2``: expand two same-length arrays in
    LOCKSTEP (position i with position i), not as a cartesian — the
    semantics CH users reach for when a row carries parallel arrays
    (values + their attributes). Spark: ``posexplode(arrays_zip(...))``
    keeps the pairing inside one generator; the oracle iterates an
    index series over both lists.

    Scale: map-side generator, output is Σ len(arr) rows — same
    row-explosion cost as any ARRAY JOIN; no shuffle introduced."""
    docs = load(spark, sf_dir, "documents")
    toks = F.slice(F.split("text", " ", -1), 1, 8)
    t = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.transform(toks, lambda s: F.length(s)).alias("lens"),
    )
    return t.select(
        "doc_id",
        F.posexplode(F.arrays_zip("toks", "lens")).alias("pos0", "z"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.col("z.toks").alias("token"),
        F.col("z.lens").cast("long").alias("token_len"),
    )


# ---------------------------------------------------------------------------
# g38_readable_decimal — CH formatReadableDecimalSize + formatReadableQuantity
# ---------------------------------------------------------------------------

# Same integer-typesetting discipline as g28 (FLOOR(x*100) digits —
# no printf tie-rounding, no locale), base-1000 units on both columns.
_G38_ORACLE = """
WITH b AS (
  SELECT c_custkey, c_custkey * 7919 AS n FROM customer
), v AS (
  SELECT c_custkey, n,
         CASE WHEN n < 1000 THEN CAST(n AS DOUBLE)
              WHEN n < 1000000 THEN CAST(n AS DOUBLE) / 1000.0
              WHEN n < 1000000000 THEN CAST(n AS DOUBLE) / 1000000.0
              ELSE CAST(n AS DOUBLE) / 1000000000.0 END AS scaled,
         CASE WHEN n < 1000 THEN 'B' WHEN n < 1000000 THEN 'KB'
              WHEN n < 1000000000 THEN 'MB' ELSE 'GB' END AS unit,
         CASE WHEN n < 1000 THEN '' WHEN n < 1000000 THEN ' thousand'
              WHEN n < 1000000000 THEN ' million' ELSE ' billion' END
           AS qty_unit
  FROM b
), c AS (
  SELECT c_custkey, n, unit, qty_unit,
         CAST(FLOOR(scaled * 100.0) AS BIGINT) AS cents
  FROM v
)
SELECT c_custkey, n,
       concat(CAST(cents // 100 AS VARCHAR), '.',
              lpad(CAST(cents % 100 AS VARCHAR), 2, '0'), ' ', unit)
         AS readable_size,
       concat(CAST(cents // 100 AS VARCHAR), '.',
              lpad(CAST(cents % 100 AS VARCHAR), 2, '0'), qty_unit)
         AS readable_qty
FROM c
ORDER BY c_custkey
"""


@register("g38_readable_decimal", oracle=_G38_ORACLE, tier="T3")
def g38_readable_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``formatReadableDecimalSize`` + ``formatReadableQuantity``:
    the base-1000 renderers (g28 ships the binary KiB family) — same
    integer-typeset digits (FLOOR(x·100), lpad) so no printf
    tie-rounding or locale can split the engines. Map-only."""
    cust = load(spark, sf_dir, "customer")
    b = cust.select("c_custkey", (F.col("c_custkey") * 7919).alias("n"))
    nd = F.col("n").cast("double")
    scaled = (
        F.when(F.col("n") < 1000, nd)
        .when(F.col("n") < 1000000, nd / 1000.0)
        .when(F.col("n") < 1000000000, nd / 1000000.0)
        .otherwise(nd / 1000000000.0)
    )
    unit = (
        F.when(F.col("n") < 1000, F.lit("B"))
        .when(F.col("n") < 1000000, F.lit("KB"))
        .when(F.col("n") < 1000000000, F.lit("MB"))
        .otherwise(F.lit("GB"))
    )
    qty_unit = (
        F.when(F.col("n") < 1000, F.lit(""))
        .when(F.col("n") < 1000000, F.lit(" thousand"))
        .when(F.col("n") < 1000000000, F.lit(" million"))
        .otherwise(F.lit(" billion"))
    )
    cents = F.floor(scaled * 100.0).cast("long")
    digits = F.concat(
        F.floor(cents / 100).cast("long").cast("string"),
        F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
    )
    return b.select(
        "c_custkey",
        "n",
        F.concat(digits, F.lit(" "), unit).alias("readable_size"),
        F.concat(digits, qty_unit).alias("readable_qty"),
    )
