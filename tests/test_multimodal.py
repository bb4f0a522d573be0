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
        "mean_byte", "decode_src",
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


def test_m2_text_payloads_take_fake_path(spark):
    # the synthetic payloads are text bytes — never decodable by a real
    # codec — so decode_src must be 'fake' whether or not PIL is present
    pdf = QUERIES["m2_decode_features"].fn(spark, SMOKE_SF_DIR).toPandas()
    assert (pdf["decode_src"] == "fake").all()


class TestDecodeGate:
    """decode_with_fallback: real codec when present+decodable, fake
    otherwise. The real-path test builds a genuine PNG and is skipped
    where Pillow is absent (this sandbox)."""

    def test_missing_codec_raises_not_implemented(self):
        from mysql_to_clickhouse_spark.operators import multimodal as mm

        if not mm._HAS_PIL:
            with pytest.raises(NotImplementedError):
                mm.real_decode(b"bytes", "image/png")
        with pytest.raises(NotImplementedError):
            mm.real_decode(b"bytes", "video/mp4")  # no video codec wired

    @pytest.mark.parametrize("path", ["fake", "real"])
    def test_fallback_dispatch(self, path):
        from mysql_to_clickhouse_spark.operators import multimodal as mm

        if path == "fake":
            w, h, c, src = mm.decode_with_fallback(b"not an image", "image/png")
            assert src == "fake"
            assert (w, h, c) == (*mm._fake_decode(b"not an image"),)
        else:
            if not mm._HAS_PIL:
                pytest.skip("Pillow unavailable in this container")
            import io

            from PIL import Image

            buf = io.BytesIO()
            Image.new("RGB", (7, 5)).save(buf, format="PNG")
            w, h, c, src = mm.decode_with_fallback(buf.getvalue(), "image/png")
            assert (w, h, c, src) == (7, 5, 3, "real")

    def test_codec_support_shape(self):
        from mysql_to_clickhouse_spark.operators.multimodal import codec_support

        sup = codec_support()
        assert set(sup) == {"image", "audio"}
        assert all(isinstance(v, bool) for v in sup.values())
