"""Minimal pure-stdlib PNG codec — grayscale 8-bit, non-interlaced.

Closes the round-2 "real multimodal codec" gap without new dependencies:
this container has no PIL/pyav, but PNG's container format (length-tagged
CRC'd chunks) and its DEFLATE payload (stdlib ``zlib``) need nothing else.
The multimodal pipeline (llm/multimodal.py) uses this to decode REAL image
bytes executor-side; the ``_fake_*`` stubs remain only as the fallback for
payloads that are not PNGs (or codecs this module doesn't cover).

Scope: color type 0 (grayscale), bit depth 8, interlace 0 — the shape the
pipeline's own fixtures use. All five scanline filters (None/Sub/Up/
Average/Paeth, RFC 2083 §6) are implemented on the decode side, so PNGs
from external writers that filter per-row decode correctly too. Everything
is per-row CPU work inside an Arrow batch: no Spark API here, and nothing
driver-side.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


class PngFormatError(ValueError):
    """Payload is not a PNG this codec can decode."""


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def encode_png_gray8(width: int, height: int, pixels: bytes) -> bytes:
    """Encode width*height 8-bit grayscale pixels as a valid PNG.

    Scanlines use filter 0 (None) — optimal filtering is a compression
    nicety, not a format requirement."""
    if width <= 0 or height <= 0 or len(pixels) != width * height:
        raise ValueError(
            f"need width*height={width * height} pixels, got {len(pixels)}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_gray8(data: bytes) -> tuple[int, int, bytes]:
    """Decode a grayscale-8 non-interlaced PNG -> (width, height, pixels).

    Verifies the signature, every chunk CRC, and the IHDR shape; raises
    PngFormatError on anything out of scope (callers fall back to the stub
    path)."""
    if not is_png(data):
        raise PngFormatError("bad signature")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngFormatError("truncated chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != zlib.crc32(tag + body):
            raise PngFormatError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise PngFormatError(
                    f"unsupported IHDR (depth={depth} color={color} "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise PngFormatError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngFormatError(f"IDAT inflate failed: {e}") from e
    stride = width  # bpp = 1 for gray8
    if len(raw) != (stride + 1) * height:
        raise PngFormatError("scanline data wrong length")
    out = bytearray(width * height)
    prev = bytes(width)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(width):
                left = line[x - 1] if x else 0
                line[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(width):
                left = line[x - 1] if x else 0
                upleft = prev[x - 1] if x else 0
                line[x] = (line[x] + _paeth(left, prev[x], upleft)) & 0xFF
        elif ftype != 0:
            raise PngFormatError(f"unknown filter {ftype}")
        out[y * width : (y + 1) * width] = line
        prev = line
    return width, height, bytes(out)
