"""Multimodal plumbing tests: the brief requires the Spark-side
mechanics (schema, batch shape, UDF signature, determinism) to be real
and tested even though the codec itself is stubbed."""

from __future__ import annotations

import math

import pytest

from mysql_to_clickhouse_spark.registry import all_queries
from mysql_to_clickhouse_spark.tables import load
from tests.conftest import SMOKE_SF_DIR

QUERIES = all_queries()


def test_m1_metadata_consistent(spark):
    pdf = QUERIES["m1_binary_ingest"].fn(spark, SMOKE_SF_DIR).toPandas()
    assert pdf["len_matches_chars"].all()  # ASCII text: bytes == chars
    assert set(pdf["mime"]) == {"image/png", "audio/wav", "video/mp4"}
    assert pdf["content_md5"].str.len().eq(32).all()


def test_m2_decode_schema_and_determinism(spark):
    df = QUERIES["m2_decode_features"].fn(spark, SMOKE_SF_DIR)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "width", "height", "channels", "resized_w", "resized_h",
        "mean_byte",
    ]
    a = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        QUERIES["m2_decode_features"]
        .fn(spark, SMOKE_SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b), "stub decode must be deterministic across runs"
    # resize contract: fits 256x256, aspect preserved within rounding
    assert (a["resized_w"] <= 256).all() and (a["resized_h"] <= 256).all()
    assert (a["channels"] == 3).all()
    n_docs = load(spark, SMOKE_SF_DIR, "documents").count()
    assert len(a) == n_docs


def test_m3_frames_tile_payload_exactly(spark):
    frames = QUERIES["m3_frame_sample"].fn(spark, SMOKE_SF_DIR).toPandas()
    docs = (
        load(spark, SMOKE_SF_DIR, "documents")
        .select("doc_id", "n_chars")
        .toPandas()
        .set_index("doc_id")["n_chars"]
    )
    per_doc = frames.groupby("doc_id")
    for doc_id, grp in per_doc:
        byte_len = int(docs[doc_id])
        assert grp["frame_len"].sum() == byte_len
        assert len(grp) == max(1, math.ceil(byte_len / 256))
        assert list(grp.sort_values("frame_idx")["offset"]) == [
            i * 256 for i in range(len(grp))
        ]


def test_real_decode_is_marked_stub():
    from mysql_to_clickhouse_spark.operators.multimodal import real_decode

    with pytest.raises(NotImplementedError):
        real_decode(b"bytes", "image/png")
