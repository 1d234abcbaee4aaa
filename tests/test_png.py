"""From-scratch PNG codec: round-trips, all five filters, real decode in
the multimodal pipeline."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from vexor_ray.functions.png import PngError, decode_png, encode_png, is_png


def test_roundtrip_rgb():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    data = encode_png(img)
    assert is_png(data)
    out = decode_png(data)
    assert out.shape == (13, 9, 3)
    assert (out == img).all()


def test_roundtrip_gray_and_rgba():
    rng = np.random.default_rng(8)
    for shape in [(5, 7), (6, 4, 4), (3, 3, 2)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        want = img if img.ndim == 3 else img[:, :, None]
        assert (out == want).all(), shape


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-encode applying a per-row filter list (spec §9 forward filter)."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    scan = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = filters[y % len(filters)]
        row = flat[y]
        enc = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            left = row[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa_ <= pb and pa_ <= pc else (up if pb <= pc else ul)
            enc[x] = (row[x] - pred) & 0xFF
        scan.append(f)
        scan.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def test_all_filters_decode():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _png_with_filters(img, filters)
        assert (decode_png(data) == img).all(), filters


def test_unsupported_rejected():
    with pytest.raises(PngError):
        decode_png(b"notapng")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    data[24] = 16  # bit depth 16
    # fix nothing else; decoder must reject before CRC matters
    with pytest.raises(PngError):
        decode_png(bytes(data))


def test_multimodal_real_png_decode(ray_session):
    import pyarrow as pa
    import ray.data

    from vexor_ray.functions.multimodal import decode_images

    img1 = np.full((4, 8, 3), 128, dtype=np.uint8)
    img1[:, :, 0] = 255  # mean = (255, 128, 128)
    img2 = np.zeros((6, 2), dtype=np.uint8)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2], type=pa.int64()),
                "payload": pa.array(
                    [encode_png(img1), encode_png(img2)], type=pa.binary()
                ),
            }
        )
    )
    out = decode_images(ds, concurrency=1).to_pandas().set_index("id")
    assert out.loc[1, "width"] == 8 and out.loc[1, "height"] == 4
    assert out.loc[2, "width"] == 2 and out.loc[2, "height"] == 6
    feat1 = np.asarray(out.loc[1, "feat"])
    assert abs(feat1[0] - 1.0) < 1e-6  # red channel mean 255/255
    assert abs(feat1[1] - 128 / 255) < 1e-6
