"""Unit tests for the stdlib PNG codec (functions/png.py): round trip,
all five scanline filters (via an independent forward-filterer built
here in the test), corruption detection, unsupported-feature gating,
and a Pillow cross-check where that library exists."""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import pytest

from mysql_to_clickhouse_spark.functions.png import (
    png_decode,
    png_decode_full,
    png_encode_gray,
)


def test_roundtrip_gray():
    data = bytes((i * 37 + 11) % 256 for i in range(1000))
    payload = png_encode_gray(data, width=64)
    w, h, c, pixels = png_decode_full(payload)
    assert (w, h, c) == (64, 16, 1)
    assert pixels[: len(data)] == data
    assert pixels[len(data) :] == b"\x00" * (64 * 16 - len(data))


def test_roundtrip_empty_and_exact_rows():
    w, h, c, px = png_decode_full(png_encode_gray(b""))
    assert (w, h, c) == (64, 1, 1) and px == b"\x00" * 64
    data = bytes(range(128))
    w, h, c, px = png_decode_full(png_encode_gray(data, width=64))
    assert (w, h, c) == (64, 2, 1) and px == data


def test_deterministic_bytes():
    data = b"the quick brown fox" * 40
    assert png_encode_gray(data) == png_encode_gray(data)


# ---------------------------------------------------------------------------
# independent forward-filter encoder: applies each PNG filter type the
# way a real encoder would, so the decoder's unfiltering is checked
# against the spec, not against our own encoder (which only emits 0)
# ---------------------------------------------------------------------------


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _forward_filter(pixels: bytes, width: int, height: int, bpp: int, ftype: int) -> bytes:
    stride = width * bpp
    out = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y else b"\x00" * stride
        out.append(ftype)
        for x in range(stride):
            left = row[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                v = row[x]
            elif ftype == 1:
                v = row[x] - left
            elif ftype == 2:
                v = row[x] - up
            elif ftype == 3:
                v = row[x] - (left + up) // 2
            else:
                v = row[x] - _paeth(left, up, ul)
            out.append(v & 0xFF)
    return bytes(out)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF)
    )


def _build_png(pixels: bytes, width: int, height: int, color: int, ftype: int) -> bytes:
    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    raw = _forward_filter(pixels, width, height, bpp, ftype)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_unfilter_all_types_all_colors(ftype, color, channels):
    w, h = 9, 7
    pixels = bytes((x * 53 + ftype * 17 + color) % 256 for x in range(w * h * channels))
    payload = _build_png(pixels, w, h, color, ftype)
    gw, gh, gc, got = png_decode_full(payload)
    assert (gw, gh, gc) == (w, h, channels)
    assert got == pixels


def test_multi_idat_chunks_concatenate():
    data = bytes(range(256)) * 2
    one = png_encode_gray(data, width=32)
    # split the single IDAT into two chunks; decoders must concatenate
    sig, rest = one[:8], one[8:]
    (ilen,) = struct.unpack(">I", rest[:4])
    ihdr_full = rest[: 12 + ilen]
    rest = rest[12 + ilen :]
    (dlen,) = struct.unpack(">I", rest[:4])
    idat_body = rest[8 : 8 + dlen]
    iend = rest[12 + dlen :]
    mid = dlen // 2
    rebuilt = (
        sig
        + ihdr_full
        + _chunk(b"IDAT", idat_body[:mid])
        + _chunk(b"IDAT", idat_body[mid:])
        + iend
    )
    assert png_decode_full(rebuilt) == png_decode_full(one)


def test_corruption_detected():
    payload = bytearray(png_encode_gray(b"hello png world" * 10))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"GIF89a" + bytes(payload))
    flipped = bytearray(payload)
    flipped[40] ^= 0xFF  # inside IDAT body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(flipped))
    with pytest.raises(ValueError, match="truncated"):
        png_decode(bytes(payload[:-6]))


def test_unsupported_features_gate_not_crash():
    ihdr_interlaced = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    p = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr_interlaced)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlacing"):
        png_decode(p)
    ihdr_16bit = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    p = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr_16bit)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 36))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth"):
        png_decode(p)


def test_idat_length_mismatch_is_error():
    # valid container, wrong pixel payload size for the declared dims
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    p = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 30))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT length"):
        png_decode(p)


def test_pillow_crosscheck():
    """Where Pillow exists: it must decode our encoder's output and we
    must decode its output, bit-for-bit (skipped in this sandbox)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    data = bytes((i * 7) % 256 for i in range(64 * 3))
    ours = png_encode_gray(data, width=64)
    img = PIL.open(io.BytesIO(ours))
    assert (img.width, img.height, img.mode) == (64, 3, "L")
    assert img.tobytes() == data
    buf = io.BytesIO()
    PIL.frombytes("RGB", (5, 4), bytes(range(60))).save(buf, format="PNG")
    w, h, c, px = png_decode_full(buf.getvalue())
    assert (w, h, c) == (5, 4, 3) and px == bytes(range(60))
