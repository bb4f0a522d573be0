"""PySpark-native analytics engine with the capabilities of the
``ywhywl/mysql-to-clickhouse`` reference (MySQL→ClickHouse replication
ETL + the ClickHouse-style analytical surface it feeds), re-expressed
Spark-first per SURVEY.md.

NOTE ON CITATIONS: the reference checkout at /root/reference was EMPTY
at survey time (SURVEY.md §0) — semantics here are grounded in the
driver contract (BASELINE.json), the measured testdata (FIXTURES.md),
and public category analogs, never in fabricated reference file:line.

Layout
------
- ``session``    : tuned SparkSession builder (local testbed + scale notes)
- ``tables``     : loaders for the ten driver parquet tables
- ``registry``   : the operator/query registry keyed by SURVEY.md §2 IDs
- ``operators/`` : one module per §2 section (scans, filters, joins, ...)
- ``functions/`` : reusable column-expression helpers (exact numerics,
                   vectors, text, hashing)
- ``sources/``   : source/sink builders (parquet, JDBC config surface)
- ``streaming/`` : Structured Streaming forms (CDC apply, replay, windows)
- ``plans/``     : plan-inspection helpers (pushdown asserts, explain)
"""

__version__ = "0.1.0"
