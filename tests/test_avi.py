"""From-scratch uncompressed-AVI container: roundtrip + real frame sampling."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from vexor_ray.functions.avi import decode_avi_frame, make_simple_avi, parse_avi


def _frames(n=5, w=6, h=4, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_avi_roundtrip_pixels():
    frames = _frames()
    avi = make_simple_avi(frames, fps=10)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    meta = parse_avi(avi)
    assert meta["width"] == 6 and meta["height"] == 4
    assert len(meta["frames"]) == len(frames)
    for want, (off, size) in zip(frames, meta["frames"]):
        got = decode_avi_frame(avi, off, size, meta["width"], meta["height"])
        np.testing.assert_array_equal(got, want)


def test_avi_odd_width_padding():
    # width 5 -> 15-byte rows padded to 16; decode must strip the pad
    frames = _frames(n=2, w=5, h=3, seed=7)
    avi = make_simple_avi(frames)
    meta = parse_avi(avi)
    got = decode_avi_frame(avi, *meta["frames"][1], meta["width"], meta["height"])
    np.testing.assert_array_equal(got, frames[1])


def test_parse_rejects_non_avi():
    assert parse_avi(b"") is None
    assert parse_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert parse_avi(b"plain text payload") is None


def _smooth_frames(n=3, w=16, h=16):
    # low-frequency gradients: JPEG-friendly, so decode error stays small
    xs = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    ys = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    out = []
    for i in range(n):
        r = (xs + 10 * i) % 256 + np.zeros_like(ys)
        g = (ys + 20 * i) % 256 + np.zeros_like(xs)
        b = np.full((h, w), (60 * i) % 256, dtype=np.float64)
        out.append(np.stack([r, g, b], axis=-1).astype(np.uint8))
    return out


def test_mjpeg_roundtrip_close():
    frames = _smooth_frames()
    avi = make_simple_avi(frames, fps=5, codec="mjpg", quality=95)
    meta = parse_avi(avi)
    assert meta["codec"] == "mjpg"
    assert meta["width"] == 16 and meta["height"] == 16
    assert len(meta["frames"]) == len(frames)
    for want, (off, size) in zip(frames, meta["frames"]):
        got = decode_avi_frame(
            avi, off, size, meta["width"], meta["height"], meta["codec"]
        )
        assert got is not None and got.shape == want.shape
        err = np.abs(got.astype(np.int32) - want.astype(np.int32)).mean()
        assert err < 8.0  # lossy but close on smooth content


def test_mjpeg_wrong_dims_refuses():
    frames = _smooth_frames(n=1)
    avi = make_simple_avi(frames, codec="mjpg")
    meta = parse_avi(avi)
    off, size = meta["frames"][0]
    assert decode_avi_frame(avi, off, size, 99, 99, "mjpg") is None


def test_interframe_codec_refused():
    # an AVI whose strf names a codec we cannot decode honestly -> None
    frames = _frames(n=1)
    avi = make_simple_avi(frames, codec="raw")
    h264 = avi.replace(
        b"\x01\x00\x18\x00\x00\x00\x00\x00",  # planes=1, bits=24, comp=0
        b"\x01\x00\x18\x00H264",  # comp='H264'
        1,
    )
    assert parse_avi(h264) is None


def test_sample_frames_stage_mjpg(ray_session):
    from vexor_ray.functions.multimodal import SampleFrames

    frames = _smooth_frames(n=6)
    avi = make_simple_avi(frames, codec="mjpg", quality=95)
    batch = pa.table(
        {"id": pa.array([1], type=pa.int64()), "payload": pa.array([avi])}
    )
    out = SampleFrames(every_n=2, real=True)(batch)
    got = out.to_pandas()
    assert list(got["frame_index"] if "frame_index" in got else got.iloc[:, 1]) == [
        0,
        2,
        4,
    ]
    assert got["id"].tolist() == [1, 1, 1]


def test_sample_frames_real_avi(ray_session):
    import ray.data

    from vexor_ray.functions.multimodal import sample_frames

    frames = _frames(n=25, w=4, h=4, seed=11)
    avi = make_simple_avi(frames)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([7], type=pa.int64()),
                "payload": pa.array([avi], type=pa.binary()),
            }
        )
    )
    df = sample_frames(ds, every_n=10).to_pandas().sort_values("frame")
    assert df["frame"].tolist() == [0, 10, 20]
    # frame_hash is the md5 of the decoded RGB pixels, not of the container
    want = hashlib.md5(np.ascontiguousarray(frames[10]).tobytes()).hexdigest()
    assert df[df["frame"] == 10]["frame_hash"].iloc[0] == want
