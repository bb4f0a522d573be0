"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``mysql_to_clickhouse_spark`` (registry
keyed by SURVEY.md §2 operator IDs); this file only adapts the registry
to the driver's entry-point shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from mysql_to_clickhouse_spark.registry import all_queries

    return all_queries()["d1_group_basic"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mysql_to_clickhouse_spark.registry import query_fns

    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI SQL oracle per query (omitted → rows-only check)."""
    from mysql_to_clickhouse_spark.registry import oracle_sqls

    return oracle_sqls()
