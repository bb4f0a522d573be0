"""Multimodal (binary) column operators — image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed via Arrow-
batched mapInPandas.

Decode is feature-gated: ``real_decode()`` probes for Pillow (image/*)
and soundfile (audio/*) at import and uses them when present; when the
codec is absent (this sandbox ships none) or the bytes don't decode,
``decode_with_fallback()`` degrades to the deterministic fake, so every
piece of Spark plumbing stays real and tested either way: binary
schema, Arrow batch shape, mapInPandas row explosion (frame sampling),
metadata structs, and partition-friendly layouts. The ``decode_src``
column records which path each row took.

The payloads derive deterministically from documents.text (the driver
testdata has no binary column), so results are stable across runs.

Registered in SURVEY §2 terms as m-ops (extension of §2.I's multimodal
north star).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.registry import register
from mysql_to_clickhouse_spark.tables import load

# ---------------------------------------------------------------------------
# m1_binary_ingest — bytes + typed metadata, SQL-verified
# ---------------------------------------------------------------------------

_M1_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS content_md5,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mime,
       octet_length(encode(text)) = n_chars AS len_matches_chars
FROM documents
ORDER BY doc_id
"""


@register("m1_binary_ingest", oracle=_M1_ORACLE)
def m1_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column ingestion: payload bytes + typed metadata columns
    (length, content hash, mime tag). BinaryType is a first-class
    parquet type — at 100 TB these are the blob shards a training
    pipeline shuffles by content hash, never by raw bytes."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.md5("text").alias("content_md5"),
        mime.alias("mime"),
        (F.octet_length(payload).cast("long") == F.col("n_chars")).alias(
            "len_matches_chars"
        ),
    )


# ---------------------------------------------------------------------------
# decode: feature-gated real codecs + deterministic fallback
# ---------------------------------------------------------------------------

import importlib.util as _ilu

_HAS_PIL = _ilu.find_spec("PIL") is not None
_HAS_SOUNDFILE = _ilu.find_spec("soundfile") is not None


def codec_support() -> dict[str, bool]:
    """Which real codecs this host ships (probed once at import).
    image is always True: PNG decode needs only stdlib zlib
    (functions/png.py), with Pillow preferred when present for the
    non-PNG formats."""
    return {"image": True, "audio": _HAS_SOUNDFILE}


def real_decode(payload: bytes, mime: str) -> tuple[int, int, int]:
    """Real codec decode — Pillow for image/* when installed, the
    stdlib PNG codec (functions/png.py) for image/png otherwise,
    soundfile for audio/*.

    Returns (width, height, channels) for images and
    (frames, samplerate, channels) for audio. Raises
    NotImplementedError when no codec covers ``mime`` (e.g. image/jpeg
    without Pillow, any video/*); the codec's own error propagates
    when the bytes don't decode — ``decode_with_fallback`` catches
    both."""
    if mime.startswith("image/"):
        if not _HAS_PIL:
            if mime == "image/png":
                from mysql_to_clickhouse_spark.functions.png import png_decode

                return png_decode(payload)
            raise NotImplementedError(
                f"Pillow not installed; only image/png decodes via the "
                f"stdlib codec, not {mime!r}"
            )
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as img:
            img.load()
            return img.width, img.height, len(img.getbands())
    if mime.startswith("audio/"):
        if not _HAS_SOUNDFILE:
            raise NotImplementedError(
                "soundfile not installed; audio decode gated off"
            )
        import io

        import soundfile as sf

        info = sf.info(io.BytesIO(payload))
        return int(info.frames), int(info.samplerate), int(info.channels)
    raise NotImplementedError(f"no codec wired for mime {mime!r}")


def decode_with_fallback(payload: bytes, mime: str) -> tuple[int, int, int, str]:
    """Try the real codec; degrade to the deterministic fake when the
    codec is missing or the payload doesn't decode. The 4th element
    tags which path ran ('real' / 'fake') so results stay auditable."""
    try:
        w, h, c = real_decode(payload, mime)
        return w, h, c, "real"
    except Exception:
        w, h, c = _fake_decode(payload)
        return w, h, c, "fake"


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic STUB decoder: fake (width, height, channels) from
    the payload bytes. Replaces a real codec so the Spark-side plumbing
    (schema, batching, partitioning) is fully exercised. (md5-based —
    Python's hash() is process-salted and would not be reproducible.)"""
    import hashlib

    h = int.from_bytes(hashlib.md5(payload[:64]).digest()[:8], "big")
    return 64 + h % 1024, 64 + (h >> 10) % 1024, 3


# ---------------------------------------------------------------------------
# m2_decode_features — mapInPandas decode + feature extraction (STUB)
# ---------------------------------------------------------------------------


def synthesize_payload(text_bytes: bytes, mime: str) -> bytes:
    """Deterministic binary payload for a doc: image/png rows carry a
    REAL PNG (the text bytes packed into an 8-bit grayscale raster via
    the stdlib encoder), audio/video rows carry the raw text bytes
    (no in-sandbox synthesizer for those containers)."""
    if mime == "image/png":
        from mysql_to_clickhouse_spark.functions.png import png_encode_gray

        return png_encode_gray(text_bytes)
    return text_bytes


@register(
    "m2_decode_features",
    oracle=None,
    tier="T3",
    no_oracle_reason=(
        "image/png rows decode for REAL in-sandbox (stdlib PNG codec, "
        "decode_src='real'); audio/video stay behind the codec gate "
        "(soundfile absent -> deterministic fake, decode_src='fake'); "
        "decoded dims aren't SQL-expressible, so the compensating test "
        "pins the real-path split, geometry, and round-trip pixels"
    ),
    test="tests/test_multimodal.py::test_m2_decode_schema_and_determinism",
)
def m2_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas
    (Arrow batches in, Arrow batches out). Payloads come from
    ``synthesize_payload`` — image/png rows are genuine PNG bytes, so
    their decode runs the REAL path (stdlib codec, or Pillow when the
    host ships it) and returns true raster geometry; audio/video rows
    are undecodable text bytes and degrade to the deterministic fake.
    The schema contract, batch iteration, and resize metadata (fit
    into 256×256 preserving aspect) are identical on both paths;
    ``decode_src`` records per-row which path ran.

    Scale: payload synthesis + decode are map-only inside one
    mapInPandas pass — no shuffle at all; decode-heavy workloads
    repartition by byte_len to balance skew."""
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"), mime.alias("mime")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.assign(
                payload=[
                    synthesize_payload(bytes(p), m)
                    for p, m in zip(pdf["payload"], pdf["mime"])
                ]
            )
            dims = pd.Series(
                [
                    decode_with_fallback(bytes(p), m)
                    for p, m in zip(pdf["payload"], pdf["mime"])
                ]
            )
            w = dims.map(lambda d: d[0]).astype("int64")
            h = dims.map(lambda d: d[1]).astype("int64")
            scale = (256.0 / pd.concat([w, h], axis=1).max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "channels": dims.map(lambda d: d[2]).astype("int64"),
                    "resized_w": (w * scale).astype("int64"),
                    "resized_h": (h * scale).astype("int64"),
                    "mean_byte": pdf["payload"].map(
                        lambda p: float(sum(p) / len(p)) if len(p) else 0.0
                    ),
                    "decode_src": dims.map(lambda d: d[3]),
                }
            )

    schema = (
        "doc_id long, width long, height long, channels long, "
        "resized_w long, resized_h long, mean_byte double, decode_src string"
    )
    return docs.mapInPandas(decode_batches, schema=schema)


# ---------------------------------------------------------------------------
# m3_frame_sample — 1→N row explosion (video frame sampling shape, STUB)
# ---------------------------------------------------------------------------


def frame_tiles(docs: DataFrame) -> DataFrame:
    """The frame LISTING (doc_id, frame_idx, offset, frame_len,
    frame_md5, frame_bytes): each payload yields ceil(len/256)
    fixed-size 'frames' via mapInPandas exploding one row into many —
    the video-decode shape. This is the raw operator surface; the
    registered m3 query folds it into the cross-engine reconstruction
    report (frame bytes kept binary so reassembly is byte-exact)."""
    import hashlib

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "offset": [],
                "frame_len": [],
                "frame_md5": [],
                "frame_bytes": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for i in range(0, max(len(data), 1), 256):
                    chunk = data[i : i + 256]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // 256)
                    out["offset"].append(i)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
                    out["frame_bytes"].append(chunk)
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, frame_idx long, offset long, frame_len long, "
        "frame_md5 string, frame_bytes binary"
    )
    return docs.mapInPandas(sample_frames, schema=schema)


_M3_ORACLE = """
SELECT doc_id,
       CAST(GREATEST(CEIL(octet_length(encode(text)) / 256.0), 1)
            AS BIGINT) AS n_frames,
       CAST(octet_length(encode(text)) AS BIGINT) AS total_len,
       md5(text) AS reassembled_md5
FROM documents
ORDER BY doc_id
"""


@register("m3_frame_sample", oracle=_M3_ORACLE, tier="T3")
def m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling with a CROSS-ENGINE reconstruction proof (the
    a21/x19 digest discipline, r7 verdict item 6): the payload is tiled
    by the mapInPandas kernel (``frame_tiles``), the tiles cross a real
    shuffle into a per-doc aggregate that reassembles them in
    frame_idx order, and the md5 of the REASSEMBLED bytes is
    hash-compared against DuckDB's md5 of the ORIGINAL text — equality
    holds iff tiling is a lossless, complete, correctly-ordered
    partition of every payload. Frame-level metadata stays available
    via ``frame_tiles`` (unit-tested tiling invariants).

    Scale: tiling is map-only; the reassembly groupBy shuffles payload
    bytes once — this is the verification query, run on samples; the
    production path consumes ``frame_tiles`` directly with no
    reassembly shuffle at all."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frames = frame_tiles(docs)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("frame_idx", "frame_bytes"))),
        lambda x: x["frame_bytes"],
    )
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.octet_length("frame_bytes")).cast("long").alias("total_len"),
        F.md5(
            F.aggregate(ordered, F.lit(b""), lambda acc, x: F.concat(acc, x))
        ).alias("reassembled_md5"),
    )


# ---------------------------------------------------------------------------
# m4_payload_dedup — exact dedup over BINARY payloads
# ---------------------------------------------------------------------------

# DuckDB 1.0 md5() is VARCHAR-only; hashing the VARCHAR hashes its
# UTF-8 bytes — identical to Spark's md5 over encode(text,'UTF-8').
_M4_ORACLE = """
SELECT md5(text) AS payload_md5,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies,
       CAST(MIN(octet_length(encode(text))) AS BIGINT) AS byte_len
FROM documents
GROUP BY payload_md5
ORDER BY payload_md5
"""


@register("m4_payload_dedup", oracle=_M4_ORACLE, tier="T2")
def m4_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i1's exact dedup applied to BINARY payloads — the multimodal
    pipeline's first pass: hash the bytes map-side (32-char digest),
    group on the digest, keep the min-doc_id shard. Raw bytes never
    shuffle; only digests and metadata do — at 100 TB that is the
    difference between shuffling terabytes and shuffling megabytes."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return (
        docs.select(
            "doc_id",
            F.md5(payload).alias("payload_md5"),
            F.octet_length(payload).cast("long").alias("byte_len"),
        )
        .groupBy("payload_md5")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("byte_len").alias("byte_len"),
        )
    )


# ---------------------------------------------------------------------------
# m5_cdc_chunking — content-defined chunking (rolling-hash boundaries)
# ---------------------------------------------------------------------------

_CDC_WINDOW = 16
_CDC_MASK_BITS = 6   # boundary when low 6 bits of the window hash are 0 (~64 B avg)
_CDC_MIN = 32
_CDC_MAX = 256


def _cdc_byte_table() -> list[int]:
    """Fixed 256-entry random-looking 64-bit table (md5-derived, no RNG
    state) — the buzhash byte mixing table, identical everywhere."""
    import hashlib

    return [
        int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
        for b in range(256)
    ]


def cdc_boundaries(data: bytes, table: list[int]) -> list[int]:
    """Pure-function chunk boundaries: buzhash (cyclic-shift rolling
    hash) over a _CDC_WINDOW-byte window; a position ends a chunk when
    the window hash's low _CDC_MASK_BITS bits are zero, subject to
    min/max chunk bounds. Returns end offsets (exclusive), always
    ending with len(data)."""
    mask = (1 << _CDC_MASK_BITS) - 1
    u64 = (1 << 64) - 1

    def rol(x: int, r: int) -> int:
        r %= 64
        return ((x << r) | (x >> (64 - r))) & u64

    ends = []
    start = 0
    h = 0
    for i, byte in enumerate(data):
        h = (rol(h, 1) ^ table[byte]) & u64
        if i - start + 1 >= _CDC_WINDOW:
            out_idx = i - _CDC_WINDOW
            if out_idx >= start:
                h ^= rol(table[data[out_idx]], _CDC_WINDOW)
        size = i - start + 1
        if size >= _CDC_MAX or (size >= _CDC_MIN and (h & mask) == 0):
            ends.append(i + 1)
            start = i + 1
            h = 0
    if start < len(data) or not data:
        ends.append(len(data))
    return ends


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """The chunk LISTING (doc_id, chunk_idx, offset, chunk_len,
    chunk_md5, is_last, chunk_bytes) from the rolling-hash cut points.
    Raw operator surface; the registered m5 query folds it into the
    cross-engine reconstruction + bounds report."""
    import hashlib

    table = _cdc_byte_table()

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "chunk_idx": [],
                "offset": [],
                "chunk_len": [],
                "chunk_md5": [],
                "is_last": [],
                "chunk_bytes": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                ends = cdc_boundaries(data, table)
                prev = 0
                for idx, end in enumerate(ends):
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(idx)
                    out["offset"].append(prev)
                    out["chunk_len"].append(end - prev)
                    out["chunk_md5"].append(
                        hashlib.md5(data[prev:end]).hexdigest()
                    )
                    out["is_last"].append(idx == len(ends) - 1)
                    out["chunk_bytes"].append(data[prev:end])
                    prev = end
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, chunk_idx long, offset long, chunk_len long, "
        "chunk_md5 string, is_last boolean, chunk_bytes binary"
    )
    return docs.mapInPandas(chunk_batches, schema=schema)


_M5_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS total_len,
       md5(text) AS reassembled_md5,
       CAST(1 AS BOOLEAN) AS bounds_ok
FROM documents
ORDER BY doc_id
"""


@register("m5_cdc_chunking", oracle=_M5_ORACLE, tier="T3")
def m5_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over binary payloads (the rsync/
    restic/LBFS trick): chunk boundaries come from a rolling hash of
    the CONTENT, so inserting bytes near the front shifts only the
    chunks it touches — all later chunks keep their identity and
    dedupe, which fixed-offset blocking (m3) structurally cannot do.
    This is the storage-dedup primitive for 100 TB multimodal blob
    lakes.

    The registered form is the CROSS-ENGINE reconstruction + bounds
    report (a21/x19 digest discipline, r7 verdict item 6): chunks from
    the ``cdc_chunks`` kernel cross a shuffle into a per-doc aggregate
    that (a) reassembles them in chunk_idx order and md5s the result —
    hash-compared against DuckDB's md5 of the original text, equal iff
    chunking is a lossless ordered partition — and (b) checks the CDC
    size invariant (every non-final chunk in [_CDC_MIN, _CDC_MAX],
    final ≤ _CDC_MAX) against the oracle's literal TRUE, so an
    invariant break is a hash mismatch, not a silent drift. Rolling-
    hash cut-point POSITIONS remain non-SQL-expressible; those stay
    pinned by the unit tests (prefix-insertion survival, coverage).

    Scale: chunking is map-only; the reassembly groupBy is the
    verification query — production consumes ``cdc_chunks`` directly
    into m4's digest dedup with no payload shuffle."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    chunks = cdc_chunks(docs)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_bytes"))),
        lambda x: x["chunk_bytes"],
    )
    non_final_min = F.min(F.when(~F.col("is_last"), F.col("chunk_len")))
    return chunks.groupBy("doc_id").agg(
        F.sum(F.octet_length("chunk_bytes")).cast("long").alias("total_len"),
        F.md5(
            F.aggregate(ordered, F.lit(b""), lambda acc, x: F.concat(acc, x))
        ).alias("reassembled_md5"),
        (
            (F.max("chunk_len") <= F.lit(_CDC_MAX))
            & F.coalesce(non_final_min >= F.lit(_CDC_MIN), F.lit(True))
        ).alias("bounds_ok"),
    )
