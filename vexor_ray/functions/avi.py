"""From-scratch AVI (RIFF) parsing and frame decode: raw DIB and MJPEG.

AVI is a RIFF container: ``RIFF <size> AVI `` wrapping LIST chunks; the
``movi`` LIST holds one chunk per video frame — ``00db`` (uncompressed
DIB, bottom-up BGR rows padded to 4-byte boundaries, the classic
Video-for-Windows layout) or ``00dc`` (compressed).  Two codecs decode
for real with stdlib + numpy only:

- raw DIB (``biCompression = 0``), and
- **MJPEG** (``biCompression = 'MJPG'``): every frame is an independent
  baseline JPEG, decoded by this repo's from-scratch JPEG codec
  (``functions/jpeg.py``) — no inter-frame prediction, so the whole format
  is honestly decodable without external libraries.

Inter-frame codecs (H.264 etc.) stay out of scope; the reference has no
video support at all, this is part of the beyond-reference training-data
surface.  ``make_simple_avi`` assembles a minimal valid file for
tests/fixtures in either codec.
"""

from __future__ import annotations

import io
import struct

import numpy as np


def _pad_row(width: int) -> int:
    return (width * 3 + 3) & ~3


def parse_avi(payload: bytes) -> dict | None:
    """Parse an AVI → {width, height, codec, frames: [(off, size)]}.

    ``codec`` is ``"raw"`` (``00db`` DIB frames) or ``"mjpg"`` (``00dc``
    JPEG frames).  Returns None when the payload is not a RIFF/AVI
    container, holds no video frames, or uses a codec this module cannot
    decode for real (inter-frame codecs).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    width = height = 0
    compression = 0

    def walk(start: int, end: int) -> list[tuple[int, int]]:
        nonlocal width, height, compression
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
                _, w, h, _, _, comp = struct.unpack_from("<IiiHHI", payload, body)
                width, height = int(w), abs(int(h))
                compression = int(comp)
            elif fourcc[2:4] in (b"db", b"dc"):
                frames.append((body, size))
            pos = body + size + (size & 1)  # chunks are word-aligned
        return frames

    frames = walk(12, len(payload))
    if not frames or width <= 0 or height <= 0:
        return None
    if compression == 0:
        codec = "raw"
    elif compression in (
        struct.unpack("<I", b"MJPG")[0],
        struct.unpack("<I", b"mjpg")[0],
    ):
        codec = "mjpg"
    else:
        return None  # inter-frame codec: no honest decode path
    return {"width": width, "height": height, "codec": codec, "frames": frames}


def decode_avi_frame(
    payload: bytes,
    off: int,
    size: int,
    width: int,
    height: int,
    codec: str = "raw",
) -> np.ndarray | None:
    """One frame chunk → (height, width, 3) uint8 RGB array."""
    if codec == "mjpg":
        from .jpeg import decode_jpeg

        try:
            frame = decode_jpeg(bytes(payload[off : off + size]))
        except Exception:
            return None
        if frame.shape[:2] != (height, width):
            return None
        return frame
    row = _pad_row(width)
    if size < row * height:
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, count=row * height, offset=off)
    rows = raw.reshape(height, row)[:, : width * 3].reshape(height, width, 3)
    # bottom-up BGR → top-down RGB
    return rows[::-1, :, ::-1]


def make_simple_avi(
    frames: list[np.ndarray],
    fps: int = 10,
    codec: str = "raw",
    quality: int = 90,
) -> bytes:
    """Minimal AVI from (h, w, 3) uint8 RGB frames.

    ``codec="raw"`` writes ``00db`` DIB frames; ``codec="mjpg"`` encodes
    each frame with the from-scratch baseline JPEG encoder into ``00dc``
    chunks (``biCompression = 'MJPG'``).
    """
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    row = _pad_row(w)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    if codec == "mjpg":
        from .jpeg import encode_jpeg

        encoded = [encode_jpeg(np.ascontiguousarray(f), quality) for f in frames]
        frame_bytes = max(len(e) for e in encoded)
        compression = struct.unpack("<I", b"MJPG")[0]
        handler = b"MJPG"
        movi_chunks = b"".join(chunk(b"00dc", e) for e in encoded)
    elif codec == "raw":
        frame_bytes = row * h
        compression = 0
        handler = b"DIB "
        movi_chunks = b"".join(
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
    else:
        raise ValueError(f"unknown codec {codec!r}")
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
        handler,
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
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", movi_chunks)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
