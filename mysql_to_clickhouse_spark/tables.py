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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (the SQL entry point)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
