"""Pure-stdlib PNG codec (zlib + struct + binascii) — the real-image
half of the multimodal feature gate.

The sandbox ships no Pillow, but PNG itself needs nothing beyond
DEFLATE: the container is length-prefixed CRC-checked chunks, IHDR
carries the geometry, and IDAT is a zlib stream of per-scanline
filtered rows (spec: https://www.w3.org/TR/png-3/, public). This
module implements the whole baseline path — signature check, chunk
walk with CRC verification, all five scanline filters (None/Sub/Up/
Average/Paeth), 8-bit depth, color types 0/2/3/4/6 — so
``decode_src='real'`` genuinely runs in-sandbox, plus a deterministic
grayscale encoder used to synthesize real image payloads from text
bytes (zlib level fixed ⇒ byte-stable output for the rows-only
determinism checks).

Out of scope (raise NotImplementedError, the fallback catches them):
interlacing (Adam7), bit depths other than 8 — neither appears in
payloads this repo synthesizes, and a real deployment swaps in Pillow,
which ``real_decode`` still prefers when present.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode_gray(data: bytes, width: int = 64) -> bytes:
    """Deterministically encode arbitrary bytes as an 8-bit grayscale
    PNG: ``width`` pixels per row, last row zero-padded, every scanline
    filter type 0, one zlib stream at a fixed level. Same input ⇒ same
    output bytes, so synthesized payloads are stable across runs."""
    if width <= 0:
        raise ValueError("width must be positive")
    if not data:
        data = b"\x00"
    height = -(-len(data) // width)
    padded = data + b"\x00" * (width * height - len(data))
    raw = b"".join(
        b"\x00" + padded[y * width : (y + 1) * width] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters into raw pixel bytes."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"IDAT length {len(raw)} != expected {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev_start = -1  # no previous row for y=0
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        if ftype == 0:  # None
            out[o : o + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                out[o + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                up = out[prev_start + x] if y else 0
                out[o + x] = (line[x] + up) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[prev_start + x] if y else 0
                out[o + x] = (line[x] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[prev_start + x] if y else 0
                ul = out[prev_start + x - bpp] if (y and x >= bpp) else 0
                out[o + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter type {ftype}")
        prev_start = o
    return out


def png_decode_full(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full decode: returns (width, height, channels, pixel_bytes).

    Verifies the signature, every chunk CRC, IHDR geometry, and the
    decompressed IDAT length; raises ValueError on corruption and
    NotImplementedError on legal-but-unsupported PNGs (interlaced,
    depth != 8)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr: tuple | None = None
    idat = bytearray()
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if crc != (crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if width <= 0 or height <= 0:
        raise ValueError("non-positive image dimensions")
    if comp != 0 or filt != 0:
        raise ValueError("invalid IHDR compression/filter method")
    if color not in _CHANNELS:
        raise ValueError(f"unknown color type {color}")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlacing not supported")
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} not supported")
    channels = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    pixels = _unfilter(raw, width, height, channels)
    return width, height, channels, bytes(pixels)


def png_decode(payload: bytes) -> tuple[int, int, int]:
    """Decode dims only: (width, height, channels) — same validation
    path as ``png_decode_full`` (the pixels are still unfiltered, so a
    corrupt IDAT cannot return 'successfully decoded' geometry)."""
    w, h, c, _ = png_decode_full(payload)
    return w, h, c
