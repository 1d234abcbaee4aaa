"""From-scratch uncompressed-AVI (RIFF) parsing and frame decode.

AVI is a RIFF container: ``RIFF <size> AVI `` wrapping LIST chunks; the
``movi`` LIST holds one ``00db`` (uncompressed DIB) chunk per video frame.
Frame pixels are bottom-up BGR rows padded to 4-byte boundaries — the
classic Video-for-Windows layout.  This module parses the container and
decodes frames with stdlib + numpy only, making the video arm of the
multimodal stages REAL for uncompressed payloads (compressed codecs —
H.264 etc. — need external libraries and stay out of scope; the reference
has no video support at all, this is part of the beyond-reference
training-data surface).

``make_simple_avi`` assembles a minimal valid file for tests/fixtures.
"""

from __future__ import annotations

import io
import struct

import numpy as np


def _pad_row(width: int) -> int:
    return (width * 3 + 3) & ~3


def parse_avi(payload: bytes) -> dict | None:
    """Parse an uncompressed AVI → {width, height, frames: [(off, size)]}.

    Returns None when the payload is not a RIFF/AVI container or holds no
    uncompressed ``00db`` frames.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    width = height = 0

    def walk(start: int, end: int) -> list[tuple[int, int]]:
        nonlocal width, height
        frames: list[tuple[int, int]] = []
        pos = start
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if fourcc == b"LIST" and size >= 4:
                frames.extend(walk(body + 4, body + size))
            elif fourcc == b"strf" and size >= 24:
                # BITMAPINFOHEADER: biSize, biWidth, biHeight, planes,
                # bitcount, compression ...
                _, w, h = struct.unpack_from("<Iii", payload, body)
                width, height = int(w), abs(int(h))
            elif fourcc[2:4] == b"db":
                frames.append((body, size))
            pos = body + size + (size & 1)  # chunks are word-aligned
        return frames

    frames = walk(12, len(payload))
    if not frames or width <= 0 or height <= 0:
        return None
    return {"width": width, "height": height, "frames": frames}


def decode_avi_frame(
    payload: bytes, off: int, size: int, width: int, height: int
) -> np.ndarray | None:
    """One ``00db`` chunk → (height, width, 3) uint8 RGB array."""
    row = _pad_row(width)
    if size < row * height:
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, count=row * height, offset=off)
    rows = raw.reshape(height, row)[:, : width * 3].reshape(height, width, 3)
    # bottom-up BGR → top-down RGB
    return rows[::-1, :, ::-1]


def make_simple_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Minimal uncompressed AVI from (h, w, 3) uint8 RGB frames."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    row = _pad_row(w)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    frame_bytes = row * h
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes/sec
        0,
        0x10,  # AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE (harmless)
        len(frames),
        0,
        1,
        frame_bytes,
        w,
        h,
        0,
        0,
        0,
        0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"DIB ",
        0,
        0,
        0,
        0,
        1,
        fps,
        0,
        len(frames),
        frame_bytes,
        0xFFFFFFFF,
        0,
        0,
        0,
        w,
        h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(
        chunk(
            b"00db",
            np.ascontiguousarray(
                np.pad(
                    f[::-1, :, ::-1].reshape(h, w * 3),
                    ((0, 0), (0, row - w * 3)),
                    mode="constant",
                )
            ).tobytes(),
        )
        for f in frames
    )
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
