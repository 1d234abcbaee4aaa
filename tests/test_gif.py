"""From-scratch GIF codec: LZW round-trips, interlace, table-cap resets,
and the DecodeImage integration."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from vexor_ray.functions.gif import decode_gif, encode_gif, is_gif


def _random_palette_image(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    return palette[idx]


@pytest.mark.parametrize("n_colors,seed", [(2, 1), (5, 2), (17, 3), (251, 4)])
def test_gif_round_trip(n_colors, seed):
    img = _random_palette_image(23, 31, n_colors, seed)
    data = encode_gif(img)
    assert is_gif(data)
    out = decode_gif(data)
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert np.array_equal(out, img)


def test_gif_round_trip_interlaced():
    img = _random_palette_image(37, 19, 7, seed=9)
    out = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(out, img)


def test_gif_lzw_table_cap_reset():
    # high-entropy large image forces the 4096-code table cap + clear reset
    img = _random_palette_image(128, 128, 256, seed=11)
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out, img)


def test_gif_solid_color_and_tiny():
    img = np.full((1, 1, 3), 200, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    img2 = np.zeros((2, 3, 3), dtype=np.uint8)
    img2[..., 1] = 255
    assert np.array_equal(decode_gif(encode_gif(img2)), img2)


def test_gif_rejects_garbage():
    assert not is_gif(b"not a gif")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 20)


def test_decode_image_stage_handles_gif(ray_session):
    import ray.data

    from vexor_ray.functions.multimodal import decode_images

    img = np.zeros((4, 8, 3), dtype=np.uint8)
    img[..., 0] = 100  # constant red plane -> known channel means
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1], type=pa.int64()),
                "payload": pa.array([encode_gif(img)], type=pa.binary()),
            }
        )
    )
    out = decode_images(ds, batch_size=4, concurrency=1).to_pandas()
    assert out.loc[0, "width"] == 8 and out.loc[0, "height"] == 4
    feat = np.asarray(out.loc[0, "feat"])
    assert np.allclose(feat[:3], [100 / 255, 0.0, 0.0], atol=1e-6)


def test_gif_lzw_bitstream_matches_hand_derivation():
    """Pin the exact wire bytes for a tiny image, derived by hand from the
    GIF89a spec's LZW + LSB-first packing rules (guards against a mutual
    encoder/decoder bug that a round-trip alone would hide)."""
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, :, :] = 255  # pixels (palette indices): [1, 1, 0, 0]
    data = encode_gif(img)
    # layout: 6 header + 7 LSD + 6 GCT (2 colors) + 10 image descriptor
    assert data[13 + 6] == 0x2C
    mcs_pos = 13 + 6 + 10
    assert data[mcs_pos] == 2  # min code size
    n = data[mcs_pos + 1]
    lzw = data[mcs_pos + 2 : mcs_pos + 2 + n]
    # hand-packed codes: clear(4,w3) 1(w3) 1(w3) 0(w3) 0(w4) eoi(5,w4)
    assert list(lzw) == [76, 0, 5]
    assert np.array_equal(decode_gif(data), img)


def test_resize_images_handles_gif(ray_session):
    import ray.data

    from vexor_ray.functions.multimodal import resize_images
    from vexor_ray.functions.png import decode_png, is_png

    img = _random_palette_image(40, 80, 5, seed=13)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1], type=pa.int64()),
                "payload": pa.array([encode_gif(img)], type=pa.binary()),
            }
        )
    )
    out = resize_images(ds, max_side=20, batch_size=4, concurrency=1).to_pandas()
    assert out.loc[0, "width"] == 20 and out.loc[0, "height"] == 10
    payload = out.loc[0, "payload"]
    assert is_png(payload)  # lossless PNG out
    assert decode_png(payload).shape == (10, 20, 3)
