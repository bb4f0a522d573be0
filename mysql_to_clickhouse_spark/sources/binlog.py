"""MySQL ROW-format binlog: fixture writer + distributed decoder.

The reference category's core input is the MySQL binary log in ROW
format — ``python-mysql-replication``'s ``BinLogStreamReader`` yields
``WriteRows/UpdateRows/DeleteRowsEvent`` objects that replicators
(Altinity clickhouse-mysql-data-reader, long2ice/synch) fold into
versioned ClickHouse inserts (SURVEY §3.1 entry point 2). No MySQL
server exists in this sandbox and egress is blocked, so this module
closes the gap at the FORMAT level, which is public and fully
specified (MySQL internals manual, "Binary log file format"; the same
layout python-mysql-replication's packet parsers consume):

- file magic ``\\xfe bin``;
- v4 event header (19 bytes): timestamp u32, type_code u8,
  server_id u32, event_size u32, log_pos u32, flags u16 — all LE;
- FORMAT_DESCRIPTION_EVENT (15): binlog_version u16 = 4, 50-byte
  server version, create timestamp, header length, per-type
  post-header-length table;
- TABLE_MAP_EVENT (19): table_id u48 + flags, then schema/table names
  (length-prefixed, NUL-terminated), column count (net-packed int),
  per-column type bytes, the type-metadata block, and the nullability
  bitmap;
- WRITE/UPDATE/DELETE_ROWS_EVENT v2 (30/31/32): table_id u48, flags,
  extra-data length (>= 2, counts itself), column count, present-
  column bitmap(s) (two for UPDATE: before + after), then per row a
  null bitmap followed by the column values. UPDATE rows alternate
  before-image / after-image.

Column types implemented (the fixture tables' surface): LONGLONG (8,
8-byte LE signed), DOUBLE (5, metadata byte = 8, IEEE-754 LE), and
VARCHAR (15, 2-byte max-length metadata; values carry a 1- or 2-byte
length prefix depending on max length, exactly the MySQL rule).
Unknown type codes raise loudly with the code named — a decoder that
guesses silently corrupts a replica.

Scale design: binlogs arrive as ROTATED FILES (a deployment caps them
at ~1 GiB); ``read_binlog`` loads them via ``spark.read.format
("binaryFile")`` and decodes each file inside ``mapInPandas`` — one
Python decode pass per file, Arrow-batched out, so a directory of
rotations decodes with per-file parallelism and NOTHING passes through
the driver. Ordering is (file name, log_pos), both emitted, so the
CDC apply can take latest-wins across rotations. Checksums: written
with checksum_alg = 0 (CHECKSUM_NONE, the pre-5.6.1 and
binlog_checksum=NONE wire shape); the decoder asserts that byte.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"\xfebin"

FORMAT_DESCRIPTION_EVENT = 15
XID_EVENT = 16
TABLE_MAP_EVENT = 19
WRITE_ROWS_EVENT_V2 = 30
UPDATE_ROWS_EVENT_V2 = 31
DELETE_ROWS_EVENT_V2 = 32

MYSQL_TYPE_DOUBLE = 5
MYSQL_TYPE_LONGLONG = 8
MYSQL_TYPE_VARCHAR = 15

_HEADER = struct.Struct("<IBIIIH")  # ts, type, server_id, size, log_pos, flags
_SERVER_ID = 1
_POST_HEADER_LEN = {  # v4 post-header lengths for the types we emit
    FORMAT_DESCRIPTION_EVENT: 84,
    XID_EVENT: 0,
    TABLE_MAP_EVENT: 8,
    WRITE_ROWS_EVENT_V2: 10,
    UPDATE_ROWS_EVENT_V2: 10,
    DELETE_ROWS_EVENT_V2: 10,
}


def _packed_int(n: int) -> bytes:
    """MySQL net-packed (length-encoded) integer — writer side."""
    if n < 251:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _read_packed_int(buf: bytes, off: int) -> tuple[int, int]:
    b0 = buf[off]
    if b0 < 251:
        return b0, off + 1
    if b0 == 0xFC:
        return struct.unpack_from("<H", buf, off + 1)[0], off + 3
    if b0 == 0xFD:
        return int.from_bytes(buf[off + 1:off + 4], "little"), off + 4
    if b0 == 0xFE:
        return struct.unpack_from("<Q", buf, off + 1)[0], off + 9
    raise ValueError(f"bad packed-int lead byte {b0:#x} at offset {off}")


class TableSchema:
    """Column layout of one replicated table: (name, mysql_type,
    max_varchar_len) triples, in column order. The PK is positional
    (MySQL ROW events carry no key metadata — replicators resolve the
    PK from the table map + their own config, as this does)."""

    def __init__(self, schema: str, table: str,
                 cols: list[tuple[str, int, int]]):
        self.schema = schema
        self.table = table
        self.cols = cols


def _encode_value(mysql_type: int, max_len: int, v) -> bytes:
    if mysql_type == MYSQL_TYPE_LONGLONG:
        return struct.pack("<q", int(v))
    if mysql_type == MYSQL_TYPE_DOUBLE:
        return struct.pack("<d", float(v))
    if mysql_type == MYSQL_TYPE_VARCHAR:
        raw = str(v).encode("utf-8")
        if len(raw) > max_len:
            raise ValueError(f"VARCHAR value exceeds max_len {max_len}")
        pre = (struct.pack("<B", len(raw)) if max_len < 256
               else struct.pack("<H", len(raw)))
        return pre + raw
    raise ValueError(f"unsupported MySQL column type {mysql_type}")


def _decode_value(mysql_type: int, max_len: int, buf: bytes,
                  off: int) -> tuple[object, int]:
    if mysql_type == MYSQL_TYPE_LONGLONG:
        return struct.unpack_from("<q", buf, off)[0], off + 8
    if mysql_type == MYSQL_TYPE_DOUBLE:
        return struct.unpack_from("<d", buf, off)[0], off + 8
    if mysql_type == MYSQL_TYPE_VARCHAR:
        if max_len < 256:
            ln = buf[off]
            off += 1
        else:
            ln = struct.unpack_from("<H", buf, off)[0]
            off += 2
        return buf[off:off + ln].decode("utf-8"), off + ln
    raise ValueError(
        f"unsupported MySQL column type {mysql_type} — refusing to guess"
    )


def _null_bitmap(row: tuple, n: int) -> bytes:
    bits = bytearray((n + 7) // 8)
    for i in range(n):
        if row[i] is None:
            bits[i // 8] |= 1 << (i % 8)
    return bytes(bits)


def _encode_row(ts_cols: list[tuple[str, int, int]], row: tuple) -> bytes:
    out = [_null_bitmap(row, len(ts_cols))]
    for (name, typ, mlen), v in zip(ts_cols, row):
        if v is not None:
            out.append(_encode_value(typ, mlen, v))
    return b"".join(out)


class _Writer:
    def __init__(self):
        self.chunks = [MAGIC]
        self.pos = 4

    def event(self, type_code: int, body: bytes, timestamp: int = 0) -> None:
        size = 19 + len(body)
        self.pos += size
        self.chunks.append(
            _HEADER.pack(timestamp, type_code, _SERVER_ID, size, self.pos, 0)
        )
        self.chunks.append(body)

    def bytes(self) -> bytes:
        return b"".join(self.chunks)


def _fde_body() -> bytes:
    ver = b"5.7.44-log".ljust(50, b"\x00")
    post = bytearray(39)  # post-header length per type code 1..39
    for code, ln in _POST_HEADER_LEN.items():
        post[code - 1] = ln
    # trailing byte: checksum algorithm 0 = CHECKSUM_NONE
    return struct.pack("<H", 4) + ver + struct.pack("<I", 0) + b"\x13" \
        + bytes(post) + b"\x00"


def _table_map_body(table_id: int, ts: TableSchema) -> bytes:
    # table_id u48 (low 4 bytes + 2 zero high bytes) + flags u16
    body = [struct.pack("<I", table_id) + b"\x00\x00" + struct.pack("<H", 0)]
    sch = ts.schema.encode()
    tbl = ts.table.encode()
    body.append(bytes([len(sch)]) + sch + b"\x00")
    body.append(bytes([len(tbl)]) + tbl + b"\x00")
    body.append(_packed_int(len(ts.cols)))
    body.append(bytes(t for _, t, _ in ts.cols))
    meta = b"".join(
        (struct.pack("<H", m) if t == MYSQL_TYPE_VARCHAR
         else (b"\x08" if t == MYSQL_TYPE_DOUBLE else b""))
        for _, t, m in ts.cols
    )
    body.append(_packed_int(len(meta)) + meta)
    body.append(b"\xff" * ((len(ts.cols) + 7) // 8))  # all nullable
    return b"".join(body)


def _rows_body(table_id: int, ts: TableSchema, rows: list,
               update: bool) -> bytes:
    ncols = len(ts.cols)
    present = b"\xff" * ((ncols + 7) // 8)
    body = [
        struct.pack("<I", table_id) + b"\x00\x00",  # table_id u48
        struct.pack("<H", 0),                       # flags
        struct.pack("<H", 2),                       # extra-data len (self)
        _packed_int(ncols),
        present,
    ]
    if update:
        body.append(present)  # after-image present bitmap
    for r in rows:
        if update:
            before, after = r
            body.append(_encode_row(ts.cols, before))
            body.append(_encode_row(ts.cols, after))
        else:
            body.append(_encode_row(ts.cols, r))
    return b"".join(body)


def write_binlog(path: str, ts: TableSchema, ops: list, *,
                 table_id: int = 109, events_per_tx: int = 64) -> None:
    """Serialize ``ops`` — a list of ``("insert", row)``,
    ``("update", (before, after))``, ``("delete", row)`` — into one
    ROW-format binlog file at ``path``. Consecutive same-op entries
    are batched into one rows-event (MySQL batches per statement), a
    TABLE_MAP precedes every rows-event (the MySQL rule: table maps
    are re-sent per event group), and an XID closes each ~tx batch."""
    w = _Writer()
    w.event(FORMAT_DESCRIPTION_EVENT, _fde_body())
    i, n, xid = 0, len(ops), 1
    while i < n:
        op = ops[i][0]
        j = i
        while j < n and ops[j][0] == op and j - i < events_per_tx:
            j += 1
        batch = [ops[k][1] for k in range(i, j)]
        w.event(TABLE_MAP_EVENT, _table_map_body(table_id, ts))
        code = {"insert": WRITE_ROWS_EVENT_V2,
                "update": UPDATE_ROWS_EVENT_V2,
                "delete": DELETE_ROWS_EVENT_V2}[op]
        w.event(code, _rows_body(table_id, ts, batch, op == "update"))
        w.event(XID_EVENT, struct.pack("<Q", xid))
        xid += 1
        i = j
    with open(path, "wb") as f:
        f.write(w.bytes())


def decode_binlog_bytes(buf: bytes) -> Iterator[dict]:
    """Decode one binlog file's bytes into row-change dicts:
    ``{"log_pos", "op", "before", "after"}`` where before/after are
    column-value tuples (None where absent). Pure Python, no Spark —
    the unit the mapInPandas wrapper runs per file."""
    if buf[:4] != MAGIC:
        raise ValueError("not a binlog file (bad magic)")
    off = 4
    table: TableSchema | None = None
    while off < len(buf):
        ts_, code, _sid, size, log_pos, _fl = _HEADER.unpack_from(buf, off)
        body = buf[off + 19:off + size]
        off += size
        if code == FORMAT_DESCRIPTION_EVENT:
            ver = struct.unpack_from("<H", body, 0)[0]
            if ver != 4:
                raise ValueError(f"binlog version {ver}, expected 4")
            if body[-1] != 0:
                raise ValueError(
                    f"checksum algorithm {body[-1]} unsupported "
                    "(write with binlog_checksum=NONE)"
                )
            continue
        if code == XID_EVENT:
            continue
        if code == TABLE_MAP_EVENT:
            p = 8  # table_id u48 + flags u16
            slen = body[p]
            schema = body[p + 1:p + 1 + slen].decode()
            p += 1 + slen + 1
            tlen = body[p]
            tname = body[p + 1:p + 1 + tlen].decode()
            p += 1 + tlen + 1
            ncols, p = _read_packed_int(body, p)
            types = list(body[p:p + ncols])
            p += ncols
            mlen, p = _read_packed_int(body, p)
            meta_end = p + mlen
            cols = []
            for t in types:
                if t == MYSQL_TYPE_VARCHAR:
                    m = struct.unpack_from("<H", body, p)[0]
                    p += 2
                elif t == MYSQL_TYPE_DOUBLE:
                    m = body[p]
                    p += 1
                else:
                    m = 0
                cols.append((f"c{len(cols)}", t, m))
            if p != meta_end:
                raise ValueError("type-metadata block length mismatch")
            table = TableSchema(schema, tname, cols)
            continue
        if code in (WRITE_ROWS_EVENT_V2, UPDATE_ROWS_EVENT_V2,
                    DELETE_ROWS_EVENT_V2):
            if table is None:
                raise ValueError("rows event before any TABLE_MAP")
            p = 8  # table_id + flags
            extra = struct.unpack_from("<H", body, p)[0]
            p += extra  # extra-data length counts itself
            ncols, p = _read_packed_int(body, p)
            nbm = (ncols + 7) // 8
            p += nbm  # present bitmap (we write all-present)
            if code == UPDATE_ROWS_EVENT_V2:
                p += nbm
            while p < len(body):
                row1, p = _decode_row(table, body, p)
                if code == UPDATE_ROWS_EVENT_V2:
                    row2, p = _decode_row(table, body, p)
                    yield {"log_pos": log_pos, "op": "update",
                           "before": row1, "after": row2}
                elif code == WRITE_ROWS_EVENT_V2:
                    yield {"log_pos": log_pos, "op": "insert",
                           "before": None, "after": row1}
                else:
                    yield {"log_pos": log_pos, "op": "delete",
                           "before": row1, "after": None}
            continue
        raise ValueError(f"unsupported binlog event type {code}")


def _decode_row(table: TableSchema, body: bytes,
                p: int) -> tuple[tuple, int]:
    n = len(table.cols)
    nulls = body[p:p + (n + 7) // 8]
    p += (n + 7) // 8
    vals = []
    for i, (_nm, t, m) in enumerate(table.cols):
        if nulls[i // 8] >> (i % 8) & 1:
            vals.append(None)
        else:
            v, p = _decode_value(t, m, body, p)
            vals.append(v)
    return tuple(vals), p


def read_binlog(spark: SparkSession, path: str,
                col_names: list[str], col_types: list[str]) -> DataFrame:
    """Distributed binlog decode: ``binaryFile`` scan of the rotation
    directory, one Python decode per FILE inside mapInPandas (Arrow
    out). Emits (log_file, log_pos, seq, op, <after-image columns>)
    rows, where seq is the 0-based row ordinal within its file — rows
    batched into one statement's event share a log_pos, so
    (log_file, log_pos, seq) is the total apply order. DELETE rows
    surface the before-image under the same columns with op='delete'
    — exactly the (pk, version, op, image) frame the a4 apply path
    consumes. Column NAMES are caller-supplied (a table map carries
    types, not names — same contract as the MySQL wire)."""
    fields = ", ".join(
        f"{n} {t}" for n, t in zip(col_names, col_types)
    )
    out_schema = (
        f"log_file string, log_pos long, seq long, op string, {fields}"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, file_row in pdf.iterrows():
                rows = []
                fname = file_row["path"].rsplit("/", 1)[-1]
                for seq, ev in enumerate(
                    decode_binlog_bytes(bytes(file_row["content"]))
                ):
                    img = ev["after"] if ev["after"] is not None \
                        else ev["before"]
                    rows.append(
                        (fname, ev["log_pos"], seq, ev["op"], *img)
                    )
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["log_file", "log_pos", "seq", "op",
                                 *col_names],
                    )

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        decode, schema=out_schema
    )
