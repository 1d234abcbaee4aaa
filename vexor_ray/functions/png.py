"""Minimal from-scratch PNG codec (stdlib zlib only) — REAL image decode.

Supports the common web-image core: 8-bit depth, grayscale (type 0),
RGB (2), gray+alpha (4) and RGBA (6), non-interlaced, with all five
scanline filters (None/Sub/Up/Average/Paeth per the PNG spec §9).
``encode_png`` writes filter-0 images for fixtures and round-trip tests.

This backs ``DecodeImage`` so the multimodal pipeline performs genuine
pixel decoding when payloads are PNGs — no PIL required; PIL still takes
precedence when importable (it covers JPEG etc.).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def is_png(data: bytes) -> bool:
    return data[:8] == _SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H, W, C).  Raises PngError on unsupported."""
    if not is_png(data):
        raise PngError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise PngError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise PngError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise PngError("missing IHDR or IDAT")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise PngError("decompressed size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = int(filters[y])
        row = rows[y]
        if f == 0:  # None
            rec = row.copy()
        elif f == 1:  # Sub — cumulative sum per channel lane mod 256
            rec = row.copy().reshape(width, ch)
            np.cumsum(rec, axis=0, out=rec)
            rec &= 0xFF
            rec = rec.reshape(stride)
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f == 3:  # Average — left-recursive, per-pixel along the row
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                rec[x] = (row[x] + _paeth(int(left), int(up), int(ul))) & 0xFF
        else:
            raise PngError(f"unknown filter {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(height, width, ch)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C in {1,2,3,4}) → PNG bytes (filter 0)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise PngError(f"unsupported channel count {ch}")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    scan[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
