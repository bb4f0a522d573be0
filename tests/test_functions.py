"""Unit tests for the determinism helpers themselves — the properties
everything else leans on."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_kernel_bitwise_equals_lambda_cosine(spark):
    """The numpy dgemm kernel and the zip_with/aggregate lambda form
    must produce BIT-identical cosines (the whole point of quantized
    fixed-point arithmetic)."""
    from mysql_to_clickhouse_spark.functions.vectors import (
        cosine,
        np_fixed_cosines,
        np_fixed_norms,
        np_quantize,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(scale=0.3, size=(12, 64)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = df.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = df.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    got = {
        (r["ia"], r["ib"]): r["c"]
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .select("ia", "ib", cosine("ea", "eb").alias("c"))
        .collect()
    }
    quant = np_quantize(vecs.astype(np.float64))
    norms = np_fixed_norms(quant)
    cos = np_fixed_cosines(quant, norms, quant, norms)
    for (i, j), v in got.items():
        assert v == cos[i, j], f"pair ({i},{j}): lambda={v!r} kernel={cos[i, j]!r}"


def test_fixed_point_negative_and_null(spark):
    from mysql_to_clickhouse_spark.functions.numeric import dsum, fixed_point

    df = spark.createDataFrame(
        [(-2.5,), (2.5,), (None,), (-0.00005,)], "v double"
    )
    fixed = df.select(fixed_point("v").alias("f")).collect()
    # FLOOR semantics: -2.5*1e4 → -25000, 2.5 → 25000, null → null,
    # -0.00005*1e4 = -0.5 → -1 (floor, not truncation)
    assert [r["f"] for r in fixed] == [-25000, 25000, None, -1]
    total = df.agg(dsum("v").alias("s")).collect()[0]["s"]
    assert total == (-25000 + 25000 + -1) / 1e4


def test_word_shingles_short_doc(spark):
    from mysql_to_clickhouse_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [("one two",), ("a b c d",)], "text string"
    )
    got = [r["s"] for r in df.select(word_shingles("text").alias("s")).collect()]
    assert got[0] == []  # fewer than 3 tokens → empty, not an error
    assert got[1] == ["a b c", "b c d"]


def test_money_render_sign_parity_with_duckdb(spark):
    """_cents_to_decimal and its oracle twin must render NEGATIVE money
    identically (floor-vs-trunc division and remainder sign conventions
    differ between the engines on signed values)."""
    import duckdb

    from mysql_to_clickhouse_spark.operators.scans import (
        _cents_to_decimal,
        o_cents_to_decimal,
    )

    cents_vals = [-1234567, -12345, -100, -99, -5, 0, 5, 99, 100, 12345]
    sdf = spark.createDataFrame([(c,) for c in cents_vals], "cents long")
    got = {
        r["cents"]: r["s"]
        for r in sdf.select(
            "cents", _cents_to_decimal(F.col("cents")).cast("string").alias("s")
        ).collect()
    }
    con = duckdb.connect()
    frag = o_cents_to_decimal("cents")
    want = {
        c: con.sql(
            f"SELECT CAST({frag} AS VARCHAR) FROM (SELECT CAST({c} AS BIGINT) AS cents)"
        ).fetchone()[0]
        for c in cents_vals
    }
    con.close()
    assert got == want
    assert got[-12345] == "-123.45" and got[-5] == "-0.05" and got[0] == "0.00"


def test_dsum_wide_survives_int64_overflow(spark):
    """dsum_wide handles sums past the int64 budget (the d48 stress
    lesson); plain dsum raises ANSI ARITHMETIC_OVERFLOW on the same
    input; both agree on small data."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from mysql_to_clickhouse_spark.functions.numeric import dsum, dsum_wide

    small = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    a = small.agg(dsum("x").alias("v")).first()["v"]
    b = small.agg(dsum_wide("x").alias("v")).first()["v"]
    assert a == b == sum(range(100))

    # 50 rows of 1e16: scaled at 1e4 -> 1e20 per row; int64 sum overflows
    big = spark.createDataFrame([(1e16,) for _ in range(50)], "x double")
    from pyspark.errors.exceptions.captured import ArithmeticException

    with _pytest.raises(Exception):
        big.agg(dsum("x").alias("v")).first()
    v = big.agg(dsum_wide("x").alias("v")).first()["v"]
    assert v == 50 * 1e16


def test_j3c_builtin_fold_bit_equal_to_j3_udaf(spark):
    """j3c (pure JVM fold, DECIMAL(38,0) dsum_wide carrier) must be
    BIT-equal to j3 (grouped-agg pandas UDAF, same carrier via Arrow):
    both accumulate the identical fixed-point integer and apply the
    identical cast/div/exp/round tail, so any divergence means one of
    the two execution boundaries broke determinism."""
    from mysql_to_clickhouse_spark.registry import all_queries
    from tests.conftest import TEST_SF_DIR

    qs = all_queries()
    udaf = (
        qs["j3_pandas_udaf"].fn(spark, TEST_SF_DIR).toPandas()
        .sort_values("event_type").reset_index(drop=True)
    )
    fold = (
        qs["j3c_builtin_geo_mean"].fn(spark, TEST_SF_DIR).toPandas()
        .sort_values("event_type").reset_index(drop=True)
    )
    assert list(udaf["event_type"]) == list(fold["event_type"])
    assert list(udaf["n"]) == list(fold["n"])
    # bit-equality, not approx: identical exact integer, identical tail
    assert [v.hex() for v in udaf["geo_mean"]] == [
        v.hex() for v in fold["geo_mean"]
    ]


def test_s10_with_fill_densifies_to_spine(spark):
    """WITH FILL semantics: the result is exactly the 720-hour literal
    January spine — filled rows are zero, non-filled rows agree with
    the undensified aggregate, and the spine is gap-free with a
    constant 1-hour step."""
    from mysql_to_clickhouse_spark.registry import all_queries
    from tests.conftest import TEST_SF_DIR

    rows = all_queries()["s10_with_fill"].fn(spark, TEST_SF_DIR).collect()
    assert len(rows) == 720  # 30 days x 24 hours, data-independent
    hours = [r["h_us"] for r in rows]
    assert hours == sorted(hours)
    assert {b - a for a, b in zip(hours, hours[1:])} == {3_600_000_000}
    observed = {r["h_us"]: r for r in rows if r["n_events"] > 0}
    filled = [r for r in rows if r["n_events"] == 0]
    assert len(observed) + len(filled) == 720
    assert all(r["sum_fp"] == 0 for r in filled)
    # the dense rows are exactly the raw aggregate (no fill distortion)
    raw = spark.sql("""
      SELECT unix_micros(date_trunc('HOUR', ts)) AS h_us, COUNT(*) AS n
      FROM parquet.`{dir}/events.parquet`
      WHERE event_type = 'error' AND value > 300.0
      GROUP BY 1
    """.format(dir=TEST_SF_DIR)).collect()
    assert {r["h_us"]: r["n"] for r in raw} == {
        h: r["n_events"] for h, r in observed.items()
    }


def test_s10b_interpolate_is_carry_forward_staircase(spark):
    """INTERPOLATE semantics: on filled rows interp_fp equals the last
    observed sum_fp (0 before the first observation); on observed rows
    it equals that row's own aggregate."""
    from mysql_to_clickhouse_spark.registry import all_queries
    from tests.conftest import TEST_SF_DIR

    qs = all_queries()
    filled = qs["s10b_with_fill_interpolate"].fn(spark, TEST_SF_DIR).collect()
    plain = {r["h_us"]: r["sum_fp"]
             for r in qs["s10_with_fill"].fn(spark, TEST_SF_DIR).collect()
             if r["n_events"] > 0}
    carry = 0
    for r in sorted(filled, key=lambda r: r["h_us"]):
        if r["n_events"] > 0:
            carry = plain[r["h_us"]]
            assert r["interp_fp"] == carry
        else:
            assert r["interp_fp"] == carry
