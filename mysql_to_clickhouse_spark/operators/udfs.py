"""§2.J — the UDF/UDAF/UDTF escape hatch, used the way it should be:
Arrow-vectorized (pandas_udf / applyInPandas) and only where built-ins
genuinely cannot express the logic. Every op here deliberately has a
built-in-free twin stated in the oracle, proving the UDF boundary
returns exactly what the declarative form would.

Scale: pandas UDFs move Arrow record batches to worker-local Python
processes — ~10-100× cheaper than row-pickling, but still off the JVM
fast path; nothing else in this engine uses Python per-row.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, DoubleType, LongType

from mysql_to_clickhouse_spark.functions.numeric import (
    dsum_wide,
    o_dsum,
    o_dsum_wide,
)
from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

# ---------------------------------------------------------------------------
# j1_python_udf — row-at-a-time scalar UDF (the slow path, demonstrated)
# ---------------------------------------------------------------------------

_J1_ORACLE = """
SELECT doc_id,
       CAST(length(text) % 97 AS BIGINT) AS len_mod,
       CAST(CASE WHEN length(text) BETWEEN 100 AND 400 THEN 1 ELSE 0 END
            AS BIGINT) AS len_ok
FROM documents
ORDER BY doc_id
"""


@register("j1_python_udf", oracle=_J1_ORACLE)
def j1_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (kept around as the last-resort escape
    hatch; the oracle restates the logic in SQL). Do not imitate in hot
    paths — see j2 for the Arrow-vectorized form."""

    @F.udf(returnType=LongType())
    def len_mod(text):
        return len(text) % 97

    @F.udf(returnType=LongType())
    def len_ok(text):
        return 1 if 100 <= len(text) <= 400 else 0

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        len_mod("text").alias("len_mod"),
        len_ok("text").alias("len_ok"),
    )


# ---------------------------------------------------------------------------
# j2_pandas_udf — Arrow-vectorized scalar UDF
# ---------------------------------------------------------------------------

_J2_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_udf,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
FROM documents
ORDER BY doc_id
"""


@register("j2_pandas_udf", oracle=_J2_ORACLE)
def j2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series→Series pandas UDF (Arrow batches, vectorized pandas str
    ops) — the correct way to run Python when you must."""

    @F.pandas_udf(LongType())
    def n_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("int64")

    @F.pandas_udf(LongType())
    def n_nonspace(texts: pd.Series) -> pd.Series:
        return texts.str.replace(" ", "", regex=False).str.len().astype("int64")

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_tokens("text").alias("n_tokens_udf"),
        n_nonspace("text").alias("n_nonspace"),
    )


# ---------------------------------------------------------------------------
# j3_pandas_udaf — grouped-aggregate pandas UDF
# ---------------------------------------------------------------------------


_J3_ORACLE = f"""
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


@register("j3_pandas_udaf", oracle=_J3_ORACLE, tier="T3")
def j3_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: geometric mean of event value per type,
    hash-proven against the SQL oracle via the d45 fixed-point
    discipline (operators/stats.py): LN is rounded at 9 decimals
    JVM-side (bit-parity with DuckDB ROUND(LN(x),9) proven by d45),
    the UDAF computes the EXACT fixed-point sum of FLOOR(lnv*1e9)
    using arbitrary-precision Python ints (no float accumulation, no
    overflow inside the kernel), and the final EXP+ROUND run JVM-side
    on the exact rational mean. Arrow-batch / partition arrival order
    therefore cannot move the result — the oracle states the identical
    formula.

    The UDAF RETURNS the fixed-point sum as DECIMAL(38,0) (the
    dsum_wide carrier): an int64 return would cap group size (~1.5e9
    rows at this value domain, ~3.7e8 in general — the r5 documented
    debt); decimal(38) holds ~1e38, so the group-size bound is gone.
    The kernel itself always summed in arbitrary-precision Python
    ints; only the Arrow return lane widened. DuckDB's SUM(BIGINT) is
    HUGEINT (128-bit exact), so both carriers are exact and the final
    decimal→double / hugeint→double casts correctly round the SAME
    integer — bit-equal geo_mean. Stress-tiered at 1e8 rows/group
    (scripts/stress.py --queries j3_pandas_udaf --rows 500000000).

    Deliberately the same statistic as d45_geometric_mean computed
    through a different execution boundary (pandas UDAF vs pure JVM
    aggregate): their agreement is itself a cross-check of the Arrow
    batch path.

    PRODUCTION ROUTE: this UDAF is the ESCAPE-HATCH demo of the
    grouped-agg pandas boundary, not the plan — the Python-worker
    Arrow round-trip costs ~2 orders of magnitude at scale (measured
    483 s vs DuckDB 3.8 s at 5e8 rows, docs/STRESS_500000000.md). The
    identical statistic with the identical unbounded DECIMAL(38,0)
    carrier runs as a pure JVM fold in j3c_builtin_geo_mean (below) —
    hash-equal to this query (tests/test_functions.py) at ~the
    engine's native aggregate speed. Reach for the UDAF shape only
    when the kernel genuinely cannot be expressed in built-ins."""
    import decimal

    import numpy as np

    # NB: pyspark's hint inference rejects `-> decimal.Decimal`, so the
    # grouped-agg form is declared via the explicit functionType enum.
    @F.pandas_udf(DecimalType(38, 0), F.PandasUDFType.GROUPED_AGG)
    def lnsum_fp(lnv):
        # FLOOR(lnv * 1e9) in double space — single IEEE multiply then
        # floor, identical to fixed_point()/o_fixed_point() on both
        # engines — then an exact arbitrary-precision sum.
        xs = np.floor(lnv.to_numpy(dtype="float64") * 1e9)
        return decimal.Decimal(int(sum(int(x) for x in xs)))

    # Spark disallows mixing a grouped-agg pandas UDF with JVM
    # aggregates in one .agg(), so the count is a UDAF too.
    @F.pandas_udf(LongType())
    def n_rows(lnv: pd.Series) -> int:
        return len(lnv)

    ev = load(spark, sf_dir, "events")
    lv = ev.filter(F.col("value") > 0).select(
        "event_type", F.round(F.log("value"), 9).alias("lnv")
    )
    return (
        lv.groupBy("event_type")
        .agg(
            n_rows("lnv").alias("n"),
            lnsum_fp("lnv").alias("s_fp"),
        )
        .select(
            "event_type",
            "n",
            F.round(
                F.exp(F.col("s_fp").cast("double") / F.lit(1e9) / F.col("n")), 9
            ).alias("geo_mean"),
        )
        
    )


# ---------------------------------------------------------------------------
# j3c_builtin_geo_mean — the pure-JVM twin of the j3 UDAF
# ---------------------------------------------------------------------------

_J3C_ORACLE = f"""
WITH lv AS (
  SELECT event_type, ROUND(LN(value), 9) AS lnv
  FROM events WHERE value > 0
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(EXP(({o_dsum_wide('lnv', 9)}) / COUNT(*)), 9) AS geo_mean
FROM lv
GROUP BY event_type
ORDER BY event_type
"""


@register("j3c_builtin_geo_mean", oracle=_J3C_ORACLE, tier="T3")
def j3c_builtin_geo_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of j3_pandas_udaf's statistic: the same
    fixed-point log-sum geometric mean as a pure built-in SQL fold —
    no Python worker, no Arrow round-trip, map-side-combinable, inside
    whole-stage codegen. Carrier parity with j3 is exact: dsum_wide's
    DECIMAL(38,0) sum holds the same unbounded fixed-point integer the
    UDAF accumulates in Python ints, so the two queries are bit-equal
    (hash-equality pinned in tests/test_functions.py), and neither has
    the int64 ~1.5e9-rows/group bound (the r5 debt).

    Scale: this is the route that closes j3's measured ~128x
    Python-UDAF tax at 5e8 rows (docs/STRESS_500000000.md;
    scripts/stress.py --queries j3c_builtin_geo_mean re-measures the
    JVM fold at the same tier). d45_geometric_mean is the same fold
    with the int64 dsum carrier — fine while n*|ln v|*1e9 < 2^63; j3c
    is the any-scale form."""
    ev = load(spark, sf_dir, "events")
    lv = ev.filter(F.col("value") > 0).select(
        "event_type", F.round(F.log("value"), 9).alias("lnv")
    )
    return (
        lv.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.exp(dsum_wide("lnv", 9) / F.count(F.lit(1))), 9
            ).alias("geo_mean"),
        )
        .select("event_type", "n", "geo_mean")
    )


# ---------------------------------------------------------------------------
# j4_apply_in_pandas — grouped-map (per-group DataFrame→DataFrame)
# ---------------------------------------------------------------------------

_J4_ORACLE = """
WITH stats AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
         MIN(value) OVER (PARTITION BY user_id) AS vmin,
         MAX(value) OVER (PARTITION BY user_id) AS vmax,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
         ) AS BIGINT) AS seq
  FROM events
)
SELECT user_id, event_id, ts_us, value,
       CASE WHEN vmax = vmin THEN 0.5
            ELSE (value - vmin) / (vmax - vmin) END AS value_scaled,
       seq
FROM stats
ORDER BY user_id, seq
"""


@register("j4_apply_in_pandas", oracle=_J4_ORACLE, tier="T3")
def j4_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user min-max scaling + sequence
    numbering, written as arbitrary per-group pandas logic. The oracle
    proves the UDTF boundary agrees with the pure-window formulation —
    per-group math is (value-min)/(max-min): identical IEEE ops.

    Scale: each group must fit in one worker's memory — fine for
    per-user groups; this is the documented constraint of the grouped-
    map pattern (SURVEY.md §4.2 spill note)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )

    def scale_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        vmin, vmax = pdf["value"].min(), pdf["value"].max()
        if vmax == vmin:
            pdf["value_scaled"] = 0.5
        else:
            pdf["value_scaled"] = (pdf["value"] - vmin) / (vmax - vmin)
        pdf["seq"] = (pdf.index + 1).astype("int64")
        return pdf

    schema = (
        "user_id long, event_id long, ts_us long, value double, "
        "value_scaled double, seq long"
    )
    return (
        ev.groupBy("user_id")
        .applyInPandas(scale_group, schema=schema)
        
    )


# ---------------------------------------------------------------------------
# j5_sql_register — UDF registered into the SQL surface
# ---------------------------------------------------------------------------

_J5_ORACLE = """
SELECT CASE WHEN o_totalprice < 100000.0 THEN 'low'
            WHEN o_totalprice < 250000.0 THEN 'mid'
            ELSE 'high' END AS band,
       COUNT(*) AS n
FROM orders
GROUP BY band
ORDER BY band
"""


@register("j5_sql_register", oracle=_J5_ORACLE, tier="T3")
def j5_sql_register(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.udf.register + use from spark.sql(...) — the SQL entry
    point consuming a Python UDF (CH user-defined-function surface)."""

    def band(p: float) -> str:
        return "low" if p < 100000.0 else ("mid" if p < 250000.0 else "high")

    spark.udf.register("price_band_udf", band, "string")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_j5")
    return spark.sql(
        """
        SELECT price_band_udf(o_totalprice) AS band, COUNT(*) AS n
        FROM orders_j5
        GROUP BY band
        ORDER BY band
        """
    )


# ---------------------------------------------------------------------------
# j6_map_in_arrow — zero-copy Arrow batch iterator (mapInArrow)
# ---------------------------------------------------------------------------

_J6_ORACLE = """
SELECT vec_id,
       CAST(FLOOR(list_aggregate(embedding, 'sum') * 10000.0) AS BIGINT)
         AS comp_sum_fp,
       CAST(len(embedding) AS INT) AS dim
FROM embeddings
ORDER BY vec_id
"""


@register("j6_map_in_arrow", oracle=_J6_ORACLE, tier="T3")
def j6_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python boundary Spark has — the
    UDF receives pyarrow RecordBatches directly (no pandas conversion
    on either edge) and emits them back. Here each embedding's
    component sum is computed with pyarrow/numpy kernels on the Arrow
    buffers; the float32 lanes are upcast to float64 BEFORE the
    left-to-right accumulation so the fold matches the oracle's
    float64 list_aggregate exactly, then fixed-pointed. The batch
    shape (not per-row) is what survives 100 TB: one Python worker
    call per Arrow batch, vectorized inside."""
    import pyarrow as pa

    def comp_sums(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            embs = batch.column("embedding")
            out_sum, out_dim = [], []
            for lst in embs:
                vals = lst.values.to_numpy(zero_copy_only=False).astype(
                    "float64"
                )
                # left-to-right fold — the same order DuckDB's
                # list_aggregate('sum') applies on float64
                acc = 0.0
                for v in vals:
                    acc += v
                out_sum.append(int(acc * 10000.0 // 1))
                out_dim.append(len(vals))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out_sum, pa.int64()), pa.array(out_dim, pa.int32())],
                names=["vec_id", "comp_sum_fp", "dim"],
            )

    emb = load(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "embedding").mapInArrow(
        comp_sums, "vec_id long, comp_sum_fp long, dim int"
    )


# ---------------------------------------------------------------------------
# j7_python_udtf — user-defined TABLE function (Spark 4 @udtf)
# ---------------------------------------------------------------------------

_J7_ORACLE = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, word,
       CAST(length(word) AS BIGINT) AS word_len,
       CAST(CASE WHEN length(word) >= 6 THEN 1 ELSE 0 END AS BIGINT) AS is_long
FROM w
ORDER BY doc_id, pos
"""


@register("j7_python_udtf", oracle=_J7_ORACLE, tier="T3")
def j7_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4's table-function escape hatch): one input
    row expands to N output rows with computed columns — the tokenizer
    shape, restated by the oracle with pure SQL unnest so the UDTF
    boundary is proven lossless. Completes the §2.J matrix: scalar
    (j1), vectorized scalar (j2), UDAF (j3), grouped-map (j4),
    SQL-registered (j5), Arrow map (j6), and now table-valued.

    Scale: UDTFs run row-at-a-time in Python workers — like j1 this is
    the LAST resort; the identical logic stays JVM-side as
    posexplode(split()) (g30). The op exists to prove the boundary,
    not to recommend it."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos bigint, word string, word_len bigint, is_long bigint")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i + 1, w, len(w), 1 if len(w) >= 6 else 0

    spark.udtf.register("j7_tokenize", Tokenize)
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("j7_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word, t.word_len, t.is_long
        FROM j7_docs d, LATERAL j7_tokenize(d.text) t
        """
    )


# ---------------------------------------------------------------------------
# j8_apply_in_arrow — grouped-map over raw Arrow tables (Spark 4)
# ---------------------------------------------------------------------------

_J8_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS v_min,
       MAX(value) AS v_max,
       CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT) AS vsum_fp
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("j8_apply_in_arrow", oracle=_J8_ORACLE, tier="T3")
def j8_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInArrow``: the grouped-map twin of j6 — each group
    arrives as ONE pyarrow.Table (no pandas materialization on either
    edge) and the kernel runs vectorized pyarrow.compute. Completes
    the §2.J escape-hatch matrix: row UDF (j1), pandas scalar (j2),
    pandas agg (j3), grouped pandas (j4), SQL-registered (j5), Arrow
    iterator (j6), UDTF (j7), grouped Arrow (j8). The min/max/count
    are exact; the sum is fixed-pointed INSIDE the kernel (int64
    floor-scale) so the Python path obeys the same determinism
    contract as the JVM path.

    Scale: one shuffle on the group key, one Python worker call per
    group with zero-copy Arrow buffers — but a SKEWED group arrives
    whole (no partial aggregation), so this is the demonstrator; the
    production spelling of THIS particular query is d1's JVM
    aggregate."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_group(table: "pa.Table") -> "pa.Table":
        v = table.column("value")
        vsum = pc.sum(
            pc.floor(pc.multiply(pc.cast(v, pa.float64()), 10000.0))
        ).as_py()
        return pa.Table.from_pydict(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n": [table.num_rows],
                "v_min": [pc.min(v).as_py()],
                "v_max": [pc.max(v).as_py()],
                # pc.sum over an all-NULL group returns null → emit
                # SQL NULL (matching the oracle's SUM) instead of
                # crashing on int(None)
                "vsum_fp": [int(vsum) if vsum is not None else None],
            },
            schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n", pa.int64()),
                    ("v_min", pa.float64()),
                    ("v_max", pa.float64()),
                    ("vsum_fp", pa.int64()),
                ]
            ),
        )

    ev = load(spark, sf_dir, "events")
    return (
        ev.select("event_type", "value")
        .groupBy("event_type")
        .applyInArrow(
            per_group,
            "event_type string, n long, v_min double, v_max double, vsum_fp long",
        )
    )
