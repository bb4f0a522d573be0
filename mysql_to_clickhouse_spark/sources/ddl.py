"""MySQL DDL → ClickHouse DDL / Spark schema mapping — the reference
category's schema-replication step (SURVEY.md §0 table, semantic step 3:
"Schema/type mapping: MySQL DDL → ClickHouse DDL"; analogs:
Altinity clickhouse-mysql-data-reader's tablebuilder, ClickHouse
MaterializedMySQL's documented type map — public docs, no file:line
citations possible with the empty reference checkout).

The map below follows the publicly documented MaterializedMySQL
conventions: integer widths map to ClickHouse fixed ints (UNSIGNED →
UInt*), DECIMAL keeps (p,s), temporal types widen to DateTime64(6)
(microsecond — what Spark timestamps and the testdata use), and
everything stringy/opaque becomes String (ClickHouse stores JSON/TEXT
payloads as String; extraction happens at query time, exactly like
g9_json_extract). Nullability: MySQL columns are nullable unless
declared NOT NULL; nullable maps to Nullable(T) on the ClickHouse side
and a nullable StructField on the Spark side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

# base_mysql_type -> (clickhouse_type, spark_type_factory)
# (p, s) handled separately for DECIMAL; UNSIGNED handled for ints.
_INT_MAP = {
    "tinyint": ("Int8", "UInt8", T.ByteType),
    "smallint": ("Int16", "UInt16", T.ShortType),
    "mediumint": ("Int32", "UInt32", T.IntegerType),
    "int": ("Int32", "UInt32", T.IntegerType),
    "integer": ("Int32", "UInt32", T.IntegerType),
    "bigint": ("Int64", "UInt64", T.LongType),
}

_SIMPLE_MAP = {
    "float": ("Float32", T.FloatType),
    "double": ("Float64", T.DoubleType),
    "real": ("Float64", T.DoubleType),
    "boolean": ("Int8", T.ByteType),
    "bool": ("Int8", T.ByteType),
    "date": ("Date32", T.DateType),
    "datetime": ("DateTime64(6)", T.TimestampType),
    "timestamp": ("DateTime64(6)", T.TimestampType),
    "time": ("String", T.StringType),
    "year": ("UInt16", T.ShortType),
    "char": ("String", T.StringType),
    "varchar": ("String", T.StringType),
    "tinytext": ("String", T.StringType),
    "text": ("String", T.StringType),
    "mediumtext": ("String", T.StringType),
    "longtext": ("String", T.StringType),
    "binary": ("String", T.BinaryType),
    "varbinary": ("String", T.BinaryType),
    "tinyblob": ("String", T.BinaryType),
    "blob": ("String", T.BinaryType),
    "mediumblob": ("String", T.BinaryType),
    "longblob": ("String", T.BinaryType),
    "json": ("String", T.StringType),
    "enum": ("LowCardinality(String)", T.StringType),
    "set": ("String", T.StringType),
    "bit": ("UInt64", T.LongType),
}

_COL_RE = re.compile(
    r"^\s*`?(?P<name>\w+)`?\s+"
    r"(?P<base>[a-zA-Z]+)"
    r"(?:\s*\(\s*(?P<p>\d+)\s*(?:,\s*(?P<s>\d+))?\s*\))?"
    r"(?:\s*\((?P<enumvals>[^)]*)\))?"
    r"(?P<unsigned>\s+unsigned)?"
    r"(?P<notnull>(?:\s+not\s+null))?",
    re.IGNORECASE,
)

_SKIP_RE = re.compile(
    r"^\s*(primary\s+key|unique\s+key|unique|key|index|constraint|"
    r"foreign\s+key|fulltext|spatial|check)\b",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class MappedColumn:
    name: str
    mysql_type: str
    ch_type: str        # includes Nullable(...) wrapping
    spark_type: str     # Spark simpleString, e.g. "int", "decimal(10,2)"
    nullable: bool

    def spark_field(self) -> T.StructField:
        return T.StructField(
            self.name,
            T._parse_datatype_string(self.spark_type),
            self.nullable,
        )


def _map_type(base: str, p, s, unsigned: bool):
    base = base.lower()
    if base == "decimal" or base == "numeric":
        p = int(p) if p else 10
        s = int(s) if s else 0
        return f"Decimal({p}, {s})", f"decimal({p},{s})"
    if base in _INT_MAP:
        signed_ch, unsigned_ch, spark_t = _INT_MAP[base]
        ch = unsigned_ch if unsigned else signed_ch
        # Spark has no unsigned ints: widen unsigned to the next size
        if unsigned:
            widen = {
                T.ByteType: T.ShortType,
                T.ShortType: T.IntegerType,
                T.IntegerType: T.LongType,
                T.LongType: T.DecimalType,  # UInt64 → decimal(20,0)
            }[spark_t]
            spark = (
                "decimal(20,0)" if widen is T.DecimalType
                else widen().simpleString()
            )
        else:
            spark = spark_t().simpleString()
        return ch, spark
    if base in _SIMPLE_MAP:
        ch, spark_t = _SIMPLE_MAP[base]
        return ch, spark_t().simpleString()
    raise ValueError(f"unmapped MySQL type: {base}")


def parse_mysql_ddl(ddl: str) -> list[MappedColumn]:
    """Parse the column list of a MySQL CREATE TABLE statement into the
    mapped (ClickHouse, Spark) schema. Index/constraint lines are
    skipped; unknown types raise (fail fast — the replication tool must
    not silently invent a mapping)."""
    body = ddl[ddl.index("(") + 1 : ddl.rindex(")")]
    cols: list[MappedColumn] = []
    for raw in re.split(r",\s*\n", body.strip()):
        line = raw.strip().rstrip(",")
        if not line or _SKIP_RE.match(line):
            continue
        m = _COL_RE.match(line)
        if not m:
            raise ValueError(f"unparseable DDL line: {line!r}")
        base = m.group("base")
        ch, spark = _map_type(
            base, m.group("p"), m.group("s"), bool(m.group("unsigned"))
        )
        nullable = not m.group("notnull")
        mysql_t = base.lower() + (
            f"({m.group('p')},{m.group('s')})" if m.group("s")
            else f"({m.group('p')})" if m.group("p") else ""
        ) + (" unsigned" if m.group("unsigned") else "")
        cols.append(
            MappedColumn(
                name=m.group("name"),
                mysql_type=mysql_t,
                ch_type=f"Nullable({ch})" if nullable else ch,
                spark_type=spark,
                nullable=nullable,
            )
        )
    return cols


def to_clickhouse_ddl(
    table: str, cols: list[MappedColumn], order_by: str
) -> str:
    """Render the mapped schema as a ReplacingMergeTree DDL — the sink
    table the category's replicators create."""
    col_lines = ",\n  ".join(f"`{c.name}` {c.ch_type}" for c in cols)
    return (
        f"CREATE TABLE {table} (\n  {col_lines}\n) "
        f"ENGINE = ReplacingMergeTree ORDER BY {order_by}"
    )


def to_spark_schema(cols: list[MappedColumn]) -> T.StructType:
    return T.StructType([c.spark_field() for c in cols])


# ---------------------------------------------------------------------------
# DDL -> binlog wire schema (r12): one parsed CREATE TABLE configures
# BOTH halves of the replica — the type map (a22) and the ROW-event
# codec (sources/binlog.py) — instead of hand-maintaining a second
# column list. Signedness lives HERE because the binlog wire does not
# carry it (raw two's-complement bytes only); this is the
# information_schema lookup a real replicator performs.
# ---------------------------------------------------------------------------

_BINLOG_TYPE_RE = re.compile(
    r"^(?P<base>[a-z]+)"
    r"(?:\s*\(\s*(?P<p>\d+)\s*(?:,\s*(?P<s>\d+))?\s*\))?"
    r"(?P<unsigned>\s+unsigned)?$"
)


def _binlog_col(mysql_type: str) -> tuple[int, int, bool]:
    """(binlog type code, type metadata, unsigned) for one parsed
    MySQL column type string. Raises for types the wire codec does not
    implement — a replicator that guesses corrupts silently."""
    from mysql_to_clickhouse_spark.sources import binlog as B

    m = _BINLOG_TYPE_RE.match(mysql_type.strip().lower())
    if m is None:
        raise ValueError(f"unparseable MySQL type {mysql_type!r}")
    base = m.group("base")
    p = int(m.group("p")) if m.group("p") else None
    s = int(m.group("s")) if m.group("s") else None
    unsigned = m.group("unsigned") is not None
    if base in ("tinyint", "bool", "boolean"):
        return B.MYSQL_TYPE_TINY, 0, unsigned
    if base in ("smallint", "year"):
        return B.MYSQL_TYPE_SHORT, 0, unsigned
    if base == "mediumint":
        return B.MYSQL_TYPE_INT24, 0, unsigned
    if base in ("int", "integer"):
        return B.MYSQL_TYPE_LONG, 0, unsigned
    if base == "bigint":
        return B.MYSQL_TYPE_LONGLONG, 0, unsigned
    if base == "float":
        return B.MYSQL_TYPE_FLOAT, 4, False
    if base in ("double", "real"):
        return B.MYSQL_TYPE_DOUBLE, 8, False
    if base in ("decimal", "numeric"):
        if p is None:
            p, s = 10, 0  # MySQL's DECIMAL default
        return B.MYSQL_TYPE_NEWDECIMAL, (p << 8) | (s or 0), False
    if base == "datetime":
        return B.MYSQL_TYPE_DATETIME2, p or 0, False
    if base == "timestamp":
        return B.MYSQL_TYPE_TIMESTAMP2, p or 0, False
    if base == "date":
        return B.MYSQL_TYPE_DATE, 0, False
    if base in ("char", "varchar"):
        # table-map metadata is the max length in BYTES (charset
        # ceiling — utf8mb4 = 4 bytes/char), which also decides the
        # 1- vs 2-byte value length prefix
        return B.MYSQL_TYPE_VARCHAR, (p or 255) * 4, False
    if base in ("text", "tinytext", "mediumtext", "longtext", "json",
                "blob", "tinyblob", "mediumblob", "longblob",
                "binary", "varbinary", "set"):
        return B.MYSQL_TYPE_BLOB, 2, False
    raise ValueError(
        f"MySQL type {mysql_type!r} has no binlog codec here "
        f"(sources/binlog.py implements the a22 surface; enum/bit/time "
        f"raise rather than guess)"
    )


def to_binlog_schema(cols: list[MappedColumn], schema: str, table: str):
    """Binlog ``TableSchema`` for a parsed CREATE TABLE — feed to
    ``write_binlog`` / compare against decoded table maps."""
    from mysql_to_clickhouse_spark.sources.binlog import TableSchema

    return TableSchema(
        schema, table,
        [(c.name, *_binlog_col(c.mysql_type)) for c in cols],
    )


def unsigned_flags(cols: list[MappedColumn]) -> list[bool]:
    """Per-column signedness for ``decode_binlog_bytes(unsigned_cols=)``
    — the information_schema half a replicator must supply because the
    wire does not carry it."""
    return [_binlog_col(c.mysql_type)[2] for c in cols]
