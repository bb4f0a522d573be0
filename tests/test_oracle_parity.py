"""The load-bearing test: every registered query vs its DuckDB oracle,
exactly mirroring (but stricter than) the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from mysql_to_clickhouse_spark.registry import all_queries
from mysql_to_clickhouse_spark.verify import run_and_compare
from tests.conftest import TEST_SF_DIR

QUERIES = all_queries()


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    result = run_and_compare(spark, duck, q, TEST_SF_DIR)
    assert result.ok, f"{name}: {result.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0
