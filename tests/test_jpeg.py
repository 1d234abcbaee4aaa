"""From-scratch baseline JPEG codec tests.

The encoder's entropy bits are validated against a HAND-DERIVED spec
bitstream (so encoder and decoder cannot share a cancelling bug in the
Huffman/zigzag tables), then round-trips cover color/gray, odd sizes,
quality levels, and the honesty gates.
"""

from __future__ import annotations

import numpy as np
import pytest

from vexor_ray.functions.jpeg import decode_jpeg, encode_jpeg, is_jpeg


def test_entropy_bits_match_hand_derived_spec_stream():
    """Flat-128 8x8 grayscale: level shift -> all-zero coefficients.

    Per ITU T.81 Annex K tables: DC size-0 (luma) is the canonical
    length-2 code '00'; AC EOB (symbol 0x00, luma) is the length-4 code
    '1010'; padded with 1s -> single entropy byte 0b00101011 = 0x2B.
    """
    data = encode_jpeg(np.full((8, 8), 128, dtype=np.uint8), quality=50)
    assert data[-3:] == bytes([0x2B, 0xFF, 0xD9])


def test_flat_image_roundtrip_exact():
    img = np.full((16, 24), 128, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(img)) == img).all()
    # DC-only non-multiple-of-8 flat color image
    rgb = np.full((10, 13, 3), 200, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert dec.shape == (10, 13, 3)
    assert np.abs(dec.astype(int) - 200).max() <= 2  # color transform rounding


@pytest.mark.parametrize("quality,psnr_floor", [(95, 45.0), (75, 35.0), (50, 30.0)])
def test_gradient_rgb_psnr(quality, psnr_floor):
    h, w = 37, 53
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 3) % 256, (xx * 5) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert dec.shape == img.shape
    mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) > psnr_floor


def test_grayscale_noise_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 40), dtype=np.int64).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) > 30.0


def test_honesty_gates():
    assert not is_jpeg(b"\x89PNG")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    data = bytearray(encode_jpeg(np.full((8, 8), 99, dtype=np.uint8)))
    # corrupt SOF0 into progressive SOF2 -> must refuse, not mis-decode
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(bytes(encode_jpeg(np.full((8, 8), 99, dtype=np.uint8)))[:-10] )


def test_decode_image_stage_routes_jpeg(ray_session):
    import ray.data

    from vexor_ray.functions.multimodal import decode_images

    img = np.full((9, 11, 3), 64, dtype=np.uint8)
    payload = encode_jpeg(img, quality=90)
    import pyarrow as pa

    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([7], pa.int64()),
                  "payload": pa.array([payload], pa.binary())})
    )
    out = decode_images(ds).to_pandas()
    assert out["width"].tolist() == [11]
    assert out["height"].tolist() == [9]
    # flat image -> per-channel means ~64/255
    feat = np.asarray(out["feat"].iloc[0])
    assert np.allclose(feat[:3], 64.0 / 255.0, atol=0.02)


def test_resize_images_stage(ray_session):
    import pyarrow as pa
    import ray.data

    from vexor_ray.functions.multimodal import resize_images
    from vexor_ray.functions.png import decode_png, encode_png

    # 128x64 gradient PNG + 100x40 flat JPEG + one non-image payload
    yy, xx = np.mgrid[0:64, 0:128]
    grad = ((yy + xx) % 256).astype(np.uint8)
    flat = np.full((40, 100, 3), 77, dtype=np.uint8)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array(
                    [encode_png(grad), encode_jpeg(flat, quality=90), b"blob"],
                    pa.binary(),
                ),
            }
        )
    )
    out = resize_images(ds, max_side=32).to_pandas().set_index("id")
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (32, 16)
    assert (out.loc[2, "width"], out.loc[2, "height"]) == (32, 13)
    assert (out.loc[3, "width"], out.loc[3, "height"]) == (-1, -1)
    r1 = decode_png(out.loc[1, "payload"])
    assert r1.shape[:2] == (16, 32)
    r2 = decode_png(out.loc[2, "payload"])
    # flat image stays flat through JPEG + bilinear (q90 rounding ≤ 2)
    assert np.abs(r2.astype(int) - 77).max() <= 2


def test_bilinear_resize_identity_and_mean():
    from vexor_ray.functions.multimodal import _bilinear_resize

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    same = _bilinear_resize(img, 8, 8)
    assert (same[:, :, 0] == img).all()  # identity at same size
    half = _bilinear_resize(img, 4, 4)
    assert abs(float(half.mean()) - float(img.mean())) < 1.0
