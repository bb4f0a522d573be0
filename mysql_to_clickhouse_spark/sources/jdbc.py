"""JDBC source/sink builders — the MySQL full-load / ClickHouse bulk-
insert surface of the reference category (SURVEY.md §3.1; analogs:
Altinity clickhouse-mysql-data-reader's tablemigrator, long2ice/synch
"full" ETL mode; no reference file citations possible — the checkout
was empty, SURVEY.md §0).

No MySQL/ClickHouse server exists in the testbed, so these builders are
the *config surface*: they produce a configured DataFrameReader/Writer
(exercised as rows-tier in a2_jdbc_source via the same chunking logic
applied to parquet). On a real deployment they are the entry/exit
points and nothing else changes.

Scale design:
- Reads are range-partitioned on the primary key (keyset pagination →
  `partitionColumn/lowerBound/upperBound/numPartitions`): N parallel
  `SELECT ... WHERE pk BETWEEN ...` chunks, bounded memory per task —
  the distributed equivalent of the category's chunked full load.
- Pushdown: Catalyst sends filters/projections into the remote WHERE —
  ship less, the same way the category filters at source.
- Writes micro-batch with `batchsize` (ClickHouse hates small inserts;
  same reason the category buffers N rows / T seconds before flushing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def chunk_ranges(
    lower: int, upper: int, num_chunks: int
) -> list[tuple[int, int]]:
    """Split [lower, upper] into num_chunks contiguous key ranges
    (keyset pagination): every key appears in exactly one range.

    This is the partitioning JDBC `partitionColumn` performs internally;
    exposed so the same chunking is testable against parquet (a2)."""
    if num_chunks <= 0:
        raise ValueError("num_chunks must be positive")
    span = upper - lower + 1
    step = max(1, span // num_chunks)
    ranges = []
    start = lower
    for i in range(num_chunks):
        end = upper if i == num_chunks - 1 else min(upper, start + step - 1)
        ranges.append((start, end))
        if end >= upper:
            break
        start = end + 1
    return ranges


def mysql_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    user: str | None = None,
    password: str | None = None,
) -> DataFrameReader:
    """Configured parallel JDBC reader for a MySQL full load.

    Returns the reader (caller runs .load()) so tests can inspect
    options without a live server."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    return reader


def clickhouse_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 100_000,
):
    """Configured bulk JDBC writer toward ClickHouse (batched inserts).

    Returns the DataFrameWriter (caller runs .save()); mode 'append' is
    the replication default — upsert semantics come from versioned
    inserts + a4_cdc_apply_latest read-side dedup, exactly the
    ReplacingMergeTree pattern (SURVEY.md §1.1)."""
    return (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "NONE")
        .mode(mode)
    )
