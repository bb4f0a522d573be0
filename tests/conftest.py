from __future__ import annotations

import os

import pytest

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from mysql_to_clickhouse_spark.session import build_session

    spark = build_session(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck(request):
    from mysql_to_clickhouse_spark.verify import duckdb_connection

    con = duckdb_connection(TEST_SF_DIR)
    yield con
    con.close()
