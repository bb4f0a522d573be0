"""CH CREATE DICTIONARY analog (functions/chdict): DDL parsing, CH
default semantics, typed gets, the inlined-map cell cap, and the
unregistered-dictionary guidance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.chdialect import (
    ch_sql,
    translate_ch_sql,
)
from mysql_to_clickhouse_spark.functions.chdict import (
    MAX_CELLS,
    dictionary_meta,
    drop_dictionary,
    register_dictionary,
)

_DDL = """
CREATE DICTIONARY t_dict (
    k Int64,
    name String,
    score Float64 DEFAULT -1.0
)
PRIMARY KEY k
SOURCE(CLICKHOUSE(TABLE 'src'))
LIFETIME(300)
LAYOUT(FLAT())
"""


@pytest.fixture
def dim(spark):
    return spark.createDataFrame(
        [(1, "alpha", 0.5), (2, "beta", 2.25), (3, "it's", None)],
        "k long, name string, score double",
    )


def _register(spark, dim):
    register_dictionary(spark, _DDL, dim)


def test_dict_lookup_and_defaults(spark, dim):
    _register(spark, dim)
    try:
        row = ch_sql(
            spark,
            "SELECT dictGet('t_dict', 'name', 2) AS hit, "
            "dictGet('t_dict', 'name', 99) AS miss_zero, "
            "dictGet('t_dict', 'score', 99) AS miss_decl_default, "
            "dictGetOrDefault('t_dict', 'name', 99, 'fb') AS fb, "
            "dictGetOrNull('t_dict', 'name', 99) AS miss_null, "
            "dictGetString('t_dict', 'name', 3) AS quoted, "
            "dictHas('t_dict', 1) AS has1, "
            "dictHas('t_dict', 99) AS has99",
        ).collect()[0]
        assert row.hit == "beta"
        # CH: missing key -> the attribute DEFAULT, never NULL
        assert row.miss_zero == ""
        assert row.miss_decl_default == -1.0
        assert row.fb == "fb"
        assert row.miss_null is None
        # values with quotes survive the literal-map inlining
        assert row.quoted == "it's"
        assert (row.has1, row.has99) == (True, False)
    finally:
        drop_dictionary("t_dict")


def test_dict_typed_get_and_attr_errors(spark, dim):
    _register(spark, dim)
    try:
        with pytest.raises(ValueError, match="is STRING"):
            translate_ch_sql("SELECT dictGetInt64('t_dict', 'name', 1)")
        with pytest.raises(ValueError, match="no attribute"):
            translate_ch_sql("SELECT dictGet('t_dict', 'nope', 1)")
        got = ch_sql(
            spark, "SELECT dictGetFloat64('t_dict', 'score', 2) AS s"
        ).collect()[0].s
        assert got == 2.25
    finally:
        drop_dictionary("t_dict")


def test_dict_unregistered_raises_with_guidance():
    drop_dictionary("ghost")
    with pytest.raises(ValueError, match="load_dim"):
        translate_ch_sql("SELECT dictGet('ghost', 'a', k) FROM t")
    with pytest.raises(ValueError, match="SEMI"):
        translate_ch_sql("SELECT dictHas('ghost', k) FROM t")


def test_dict_cell_cap_raises(spark):
    big = spark.range(MAX_CELLS + 1).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("name")
    )
    ddl = (
        "CREATE DICTIONARY big_dict (k Int64, name String) "
        "PRIMARY KEY k SOURCE(CLICKHOUSE(TABLE 'b')) "
        "LIFETIME(1) LAYOUT(HASHED())"
    )
    with pytest.raises(ValueError, match="broadcast dimension join"):
        register_dictionary(spark, ddl, big)
    assert dictionary_meta("big_dict") is None


def test_dict_ddl_parse_errors(spark, dim):
    with pytest.raises(ValueError, match="not a CREATE DICTIONARY"):
        register_dictionary(spark, "SELECT 1", dim)
    with pytest.raises(ValueError, match="unsupported CH type"):
        register_dictionary(
            spark,
            "CREATE DICTIONARY d (k Int64, g Geometry) PRIMARY KEY k",
            dim,
        )
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        register_dictionary(
            spark,
            "CREATE DICTIONARY d (name String) PRIMARY KEY k",
            dim.select("name"),
        )


def test_dict_reregistration_refreshes(spark, dim):
    _register(spark, dim)
    try:
        v1 = ch_sql(
            spark, "SELECT dictGet('t_dict', 'name', 1) AS v"
        ).collect()[0].v
        assert v1 == "alpha"
        register_dictionary(
            spark,
            _DDL,
            spark.createDataFrame(
                [(1, "ALPHA2", 9.0)], "k long, name string, score double"
            ),
        )
        v2 = ch_sql(
            spark, "SELECT dictGet('t_dict', 'name', 1) AS v"
        ).collect()[0].v
        assert v2 == "ALPHA2"
    finally:
        drop_dictionary("t_dict")


def test_dict_ddl_routed_from_sql_surface():
    """Pasted CREATE DICTIONARY / SYSTEM RELOAD statements get the
    pointed front-door error, not a Spark parse error."""
    with pytest.raises(ValueError, match="register_dictionary"):
        translate_ch_sql(_DDL)
    with pytest.raises(ValueError, match="registration is the refresh"):
        translate_ch_sql("SYSTEM RELOAD DICTIONARIES")


def test_dict_backslash_values_roundtrip(spark):
    """Dictionary values containing backslashes/newlines survive the
    literal-map inlining (the bind_params backslash-escape rule)."""
    ddl = (
        "CREATE DICTIONARY esc_dict (k Int64, name String) "
        "PRIMARY KEY k SOURCE(CLICKHOUSE(TABLE 's')) "
        "LIFETIME(1) LAYOUT(HASHED())"
    )
    register_dictionary(
        spark,
        ddl,
        spark.createDataFrame(
            [(1, "a\\nb"), (2, "c\\'d")], "k long, name string"
        ),
    )
    try:
        row = ch_sql(
            spark,
            "SELECT dictGet('esc_dict', 'name', 1) AS a, "
            "dictGet('esc_dict', 'name', 2) AS b",
        ).collect()[0]
        assert row.a == "a\\nb" and row.b == "c\\'d"
    finally:
        drop_dictionary("esc_dict")


def test_dict_composite_key(spark):
    """COMPLEX_KEY dictionaries: PRIMARY KEY (region, code) — lookups
    take CH tuple syntax, missing composite keys hit defaults, dictHas
    probes the full key."""
    ddl = (
        "CREATE DICTIONARY rates (region String, code Int64, "
        "rate Float64 DEFAULT 0.0, label String) "
        "PRIMARY KEY region, code "
        "SOURCE(CLICKHOUSE(TABLE 'r')) LIFETIME(60) "
        "LAYOUT(COMPLEX_KEY_HASHED())"
    )
    register_dictionary(
        spark,
        ddl,
        spark.createDataFrame(
            [("eu", 1, 0.2, "low"), ("us", 1, 0.35, "high"),
             ("eu", 2, 0.05, "zero-ish")],
            "region string, code long, rate double, label string",
        ),
    )
    try:
        row = ch_sql(
            spark,
            "SELECT dictGet('rates', 'rate', ('us', 1)) AS us1, "
            "dictGet('rates', 'label', tuple('eu', 2)) AS eu2, "
            "dictGet('rates', 'rate', ('eu', 99)) AS miss, "
            "dictGetOrDefault('rates', 'label', ('xx', 9), '?') AS fb, "
            "dictHas('rates', ('eu', 1)) AS has_eu1, "
            "dictHas('rates', ('eu', 99)) AS has_miss",
        ).collect()[0]
        assert row.us1 == 0.35
        assert row.eu2 == "zero-ish"
        assert row.miss == 0.0
        assert row.fb == "?"
        assert (row.has_eu1, row.has_miss) == (True, False)
        with pytest.raises(ValueError, match="pass a tuple"):
            translate_ch_sql("SELECT dictGet('rates', 'rate', k)")
        with pytest.raises(ValueError, match="2 parts"):
            translate_ch_sql(
                "SELECT dictGet('rates', 'rate', (a, b, c))"
            )
    finally:
        drop_dictionary("rates")


def test_dict_duplicate_source_keys_last_wins(spark):
    """A source with repeated keys must register (Spark's map() literal
    throws on duplicate keys at runtime) and resolve to the LAST
    occurrence — the upsert reading (r12 ADVICE)."""
    dup = spark.createDataFrame(
        [(1, "old", 1.0), (2, "beta", 2.0), (1, "new", 9.0)],
        "k long, name string, score double",
    )
    register_dictionary(spark, _DDL, dup)
    try:
        row = ch_sql(
            spark,
            "SELECT dictGet('t_dict', 'name', 1) AS n, "
            "dictGet('t_dict', 'score', 1) AS s, "
            "dictHas('t_dict', 1) AS h",
        ).collect()[0]
        assert (row.n, row.s, row.h) == ("new", 9.0, True)
    finally:
        drop_dictionary("t_dict")
