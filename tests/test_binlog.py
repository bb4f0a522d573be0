"""ROW-format binlog writer/decoder (sources/binlog.py) — format
round-trip properties plus the distributed read path (a35)."""

import os
import struct

import pytest

from mysql_to_clickhouse_spark.sources.binlog import (
    MAGIC,
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VARCHAR,
    TableSchema,
    decode_binlog_bytes,
    read_binlog,
    write_binlog,
)

TS = TableSchema(
    "app", "t",
    [
        ("pk", MYSQL_TYPE_LONGLONG, 0),
        ("name", MYSQL_TYPE_VARCHAR, 64),
        ("v", MYSQL_TYPE_DOUBLE, 8),
    ],
)


def _write(tmp_path, ops, ts=TS):
    p = os.path.join(str(tmp_path), "binlog.000001")
    write_binlog(p, ts, ops)
    return open(p, "rb").read()


def test_round_trip_all_ops(tmp_path):
    ops = [
        ("insert", (1, "a", 1.5)),
        ("update", ((1, "a", 1.5), (1, "a+u", 3.0))),
        ("delete", (1, "a+u", 3.0)),
        ("insert", (2, None, -0.25)),  # NULL varchar -> null bitmap
    ]
    evs = list(decode_binlog_bytes(_write(tmp_path, ops)))
    assert [e["op"] for e in evs] == ["insert", "update", "delete", "insert"]
    assert evs[0]["after"] == (1, "a", 1.5) and evs[0]["before"] is None
    assert evs[1]["before"] == (1, "a", 1.5)
    assert evs[1]["after"] == (1, "a+u", 3.0)
    assert evs[2]["before"] == (1, "a+u", 3.0) and evs[2]["after"] is None
    assert evs[3]["after"] == (2, None, -0.25)


def test_batched_inserts_share_log_pos_and_stay_ordered(tmp_path):
    ops = [("insert", (i, f"r{i}", float(i))) for i in range(10)]
    evs = list(decode_binlog_bytes(_write(tmp_path, ops)))
    assert len(evs) == 10
    # one WRITE_ROWS statement batches them: single log_pos, wire order
    assert len({e["log_pos"] for e in evs}) == 1
    assert [e["after"][0] for e in evs] == list(range(10))


def test_wide_varchar_uses_two_byte_length_prefix(tmp_path):
    wide = TableSchema("app", "t", [("pk", MYSQL_TYPE_LONGLONG, 0),
                                    ("txt", MYSQL_TYPE_VARCHAR, 1024)])
    long_s = "x" * 700  # needs the 2-byte prefix path
    evs = list(decode_binlog_bytes(
        _write(tmp_path, [("insert", (7, long_s))], ts=wide)))
    assert evs[0]["after"] == (7, long_s)


def test_doubles_round_trip_bit_exact(tmp_path):
    vals = [0.1, -1e300, 5e-324, 2.0 ** 53 + 2, float("inf")]
    ops = [("insert", (i, "d", v)) for i, v in enumerate(vals)]
    evs = list(decode_binlog_bytes(_write(tmp_path, ops)))
    got = [e["after"][2] for e in evs]
    assert [struct.pack("<d", g) for g in got] == [
        struct.pack("<d", v) for v in vals
    ]


def test_log_pos_monotone_and_decoder_raises_loudly(tmp_path):
    buf = _write(tmp_path, [("insert", (1, "a", 1.0)),
                            ("delete", (1, "a", 1.0))])
    lps = [e["log_pos"] for e in decode_binlog_bytes(buf)]
    assert lps == sorted(lps)
    with pytest.raises(ValueError, match="magic"):
        list(decode_binlog_bytes(b"nope" + buf[4:]))
    # unknown event type byte raises with the code named
    bad = bytearray(buf)
    bad[4 + 4] = 99  # first event header's type_code
    with pytest.raises(ValueError, match="99"):
        list(decode_binlog_bytes(bytes(bad)))


def test_unsupported_column_type_raises():
    odd = TableSchema("app", "t", [("pk", 246, 0)])  # DECIMAL: not impl
    with pytest.raises(ValueError, match="246"):
        write_binlog("/dev/null", odd, [("insert", (1,))])


def test_read_binlog_distributed_multi_file(spark, tmp_path):
    d = str(tmp_path)
    write_binlog(os.path.join(d, "binlog.000001"), TS,
                 [("insert", (1, "a", 1.0)), ("insert", (2, "b", 2.0))])
    write_binlog(os.path.join(d, "binlog.000002"), TS,
                 [("update", ((1, "a", 1.0), (1, "a2", 10.0))),
                  ("delete", (2, "b", 2.0))])
    df = read_binlog(spark, d, ["pk", "name", "v"],
                     ["long", "string", "double"])
    rows = sorted(
        df.collect(), key=lambda r: (r["log_file"], r["log_pos"], r["seq"])
    )
    assert [r["op"] for r in rows] == ["insert", "insert", "update", "delete"]
    assert rows[0]["log_file"] == "binlog.000001"
    assert rows[2]["log_file"] == "binlog.000002"
    # update surfaces the AFTER image; delete the BEFORE image
    assert (rows[2]["pk"], rows[2]["name"], rows[2]["v"]) == (1, "a2", 10.0)
    assert (rows[3]["pk"], rows[3]["name"], rows[3]["v"]) == (2, "b", 2.0)
    # seq restarts per file
    assert [r["seq"] for r in rows] == [0, 1, 0, 1]
