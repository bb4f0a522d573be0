"""Loaders for the ten driver-provided parquet tables (FIXTURES.md).

All engine queries take ``(spark, sf_dir)`` and load through here, so
scan behavior (schema, pushdown) is uniform and testable in one place.
At 100 TB these reads become partitioned-directory scans on a real
filesystem; nothing else changes — predicate pushdown, column pruning
and partition pruning all apply at the `spark.read.parquet` boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables: always safe to broadcast in joins (bounded cardinality
# even at 100 TB fact scale — region=5, nation=25; customer/supplier/part
# grow with SF but stay orders of magnitude below the facts).
DIM_TABLES = ("region", "nation", "customer", "supplier", "part")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is ns-precision parquet, which Spark 4 refuses outright
    (PARQUET_TYPE_ILLEGAL) unless read as a bigint. Read ns-as-long and
    convert to a µs TimestampType at the scan boundary — truncation for
    positive epochs, exactly matching the DuckDB oracle's
    CAST(TIMESTAMP_NS AS TIMESTAMP).

    The conf is session-level and settable at runtime, so this works
    under the driver's own SparkSession too (verified).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (the SQL entry point)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
