"""Real JDBC round trip against embedded Apache Derby.

Every prior round exercised sources/jdbc.py as a *config surface* only
(no database server in the sandbox). Spark's own distribution ships the
Derby jars (used internally for the Hive metastore), so the embedded
`jdbc:derby:` URL gives a real in-process SQL database: these tests run
the actual `clickhouse_writer` / `mysql_reader` builders end-to-end —
batched JDBC INSERTs out, key-range-partitioned parallel SELECTs back,
filter pushdown into the remote WHERE — the exact mechanics a MySQL
full-load / ClickHouse bulk-insert deployment uses, minus only the
vendor URL. Feature-gated the same way as the multimodal codecs: skip
cleanly where the Derby jars are absent.
"""

from __future__ import annotations

import glob
import os

import pytest

from mysql_to_clickhouse_spark.sources.jdbc import clickhouse_writer, mysql_reader

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_jars_present() -> bool:
    import pyspark

    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return bool(glob.glob(os.path.join(jar_dir, "derby-*.jar")))


pytestmark = pytest.mark.skipif(
    not _derby_jars_present(),
    reason="Derby jars absent from the Spark classpath (feature gate)",
)


@pytest.fixture(scope="module")
def derby_db(spark, tmp_path_factory):
    """One populated Derby database per module: orders written through
    the repo's own bulk-insert builder."""
    home = tmp_path_factory.mktemp("derby")
    # Keep derby.log out of the repo cwd (Derby boots once per JVM).
    spark._jvm.System.setProperty("derby.system.home", str(home))
    db = f"{home}/rtdb"
    src = (
        spark.read.parquet(os.path.join(SMOKE_SF_DIR, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    writer = clickhouse_writer(
        src,
        url=f"jdbc:derby:{db};create=true",
        table="ORDERS_RT",
        mode="overwrite",
        batch_size=1000,
    ).option("driver", _DERBY_DRIVER)
    writer.save()
    return db, src


def _reader(spark, db: str, num_partitions: int = 8):
    return mysql_reader(
        spark,
        url=f"jdbc:derby:{db}",
        table="ORDERS_RT",
        partition_column="o_orderkey",
        lower_bound=1,
        upper_bound=6000,
        num_partitions=num_partitions,
    ).option("driver", _DERBY_DRIVER)


def test_roundtrip_values_exact(spark, derby_db):
    """Write → parallel chunked read returns byte-identical rows."""
    db, src = derby_db
    got = _reader(spark, db).load()
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, got.collect()))
    assert len(b) == 1500
    assert a == b


def test_read_is_parallel_keyset(spark, derby_db):
    """partitionColumn/lowerBound/upperBound/numPartitions produce N
    real JDBC partitions (each its own remote range SELECT) and no row
    is lost or duplicated across chunk boundaries."""
    db, src = derby_db
    got = _reader(spark, db, num_partitions=8).load()
    assert got.rdd.getNumPartitions() == 8
    assert got.count() == src.count()
    assert (
        got.select("o_orderkey").distinct().count()
        == src.select("o_orderkey").distinct().count()
    )


def test_filter_and_projection_pushdown(spark, derby_db):
    """Catalyst sends the predicate into the remote WHERE (PushedFilters
    with the source-handled `*` marker) and prunes columns in the remote
    SELECT list — ship-less, the reason JDBC reads stay cheap at scale."""
    db, src = derby_db
    got = (
        _reader(spark, db)
        .load()
        .filter("o_totalprice > 100000.0")
        .select("o_orderkey", "o_totalprice")
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThan(o_totalprice" in plan
    assert "o_custkey" not in plan.split("ReadSchema")[1][:200]
    expected = src.filter("o_totalprice > 100000.0").count()
    assert got.count() == expected


def test_append_mode_accumulates(spark, derby_db):
    """The replication default (mode='append', versioned inserts) really
    appends: a second batch lands without clobbering the first — upsert
    semantics then come from read-side latest-wins (a4), exactly the
    ReplacingMergeTree pattern."""
    db, src = derby_db
    extra = src.limit(10)
    clickhouse_writer(
        extra,
        url=f"jdbc:derby:{db}",
        table="ORDERS_RT",
        mode="append",
        batch_size=1000,
    ).option("driver", _DERBY_DRIVER).save()
    total = _reader(spark, db).load().count()
    assert total == 1510
    # Restore the pristine table for any later test in this module.
    clickhouse_writer(
        src,
        url=f"jdbc:derby:{db}",
        table="ORDERS_RT",
        mode="overwrite",
        batch_size=1000,
    ).option("driver", _DERBY_DRIVER).save()
