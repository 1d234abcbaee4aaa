"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video travel as ``binary`` columns with a sidecar metadata
struct; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  The decode kernels themselves are STUBBED (the
image/audio libraries are not in this environment): ``DecodeImage`` tries to
import PIL at actor init and otherwise uses a clearly-marked deterministic
fake decoder, so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested while the pixel math is not.

Scale notes: payload rows are wide → callers should use a small
``batch_size`` (e.g. 32-128) and let blocks stay under the object-store
block target; outputs drop the payload column immediately.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

IMAGE_META_TYPE = pa.struct(
    [("width", pa.int32()), ("height", pa.int32()), ("format", pa.string())]
)


class DecodeImage:
    """Actor-pool stage: (id, payload:binary) → (id, width, height, feat).

    Real decoder when PIL is importable; otherwise a deterministic fake that
    derives dimensions and a 16-dim feature vector from a content hash.
    The fake is NOT a vision model — it exists to exercise schema/flow.
    """

    def __init__(self, feat_dim: int = 16):
        self.feat_dim = feat_dim
        try:
            from PIL import Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def _decode_real(self, payload: bytes):
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img, dtype=np.float64)
        feat = arr.mean(axis=(0, 1)).ravel()
        feat = np.resize(feat, self.feat_dim)
        return img.width, img.height, feat

    def _decode_fake(self, payload: bytes):
        # all values are md5-derived (DuckDB md5_number_lower parity) so the
        # stub is value-checkable by the SQL oracle, not just shape-checked;
        # nibble/16 is a power-of-two quotient → exact in float32 AND double
        from .dedup import md5_u64

        h = md5_u64(payload or b"")
        width = 64 + (h & 0xFF)
        height = 64 + ((h >> 8) & 0xFF)
        nibbles = np.array(
            [(h >> (4 * (j % 16))) & 0xF for j in range(self.feat_dim)],
            dtype=np.float64,
        )
        feat = nibbles / 16.0
        return width, height, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            w, h, f = (
                self._decode_real(p) if self._pil else self._decode_fake(p)
            )
            widths.append(w)
            heights.append(h)
            feats.append(f.tolist())
        return pa.table(
            {
                "id": batch.column("id"),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "feat": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )


class SampleFrames:
    """Actor-pool stage: (id, payload) → one row per sampled frame offset.

    Stub frame sampler: emits ``every_n``-th logical frame index with a
    content-derived pseudo-frame hash (real video decode is not available in
    this environment — raise if a real decoder is demanded).
    """

    def __init__(self, every_n: int = 10, real: bool = False):
        if real:
            raise NotImplementedError(
                "video decoding libraries are not available in this environment"
            )
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_frame, out_hash = [], [], []
        for i, p in zip(ids, payloads):
            n_frames = 1 + (len(p or b"") % 100)
            # frame hash = md5(md5(payload) || '#' || frame) — string-domain
            # composition so SQL reproduces it with its own md5()
            base = hashlib.md5(p or b"").hexdigest()
            for f in range(0, n_frames, self.every_n):
                out_id.append(i)
                out_frame.append(f)
                out_hash.append(
                    hashlib.md5(f"{base}#{f}".encode()).hexdigest()
                )
        return pa.table(
            {
                "id": pa.array(out_id, type=pa.int64()),
                "frame": pa.array(out_frame, type=pa.int32()),
                "frame_hash": pa.array(out_hash, type=pa.string()),
            }
        )


def decode_images(
    ds: ray.data.Dataset, *, batch_size: int = 64, concurrency: int | tuple = (1, 4)
) -> ray.data.Dataset:
    """(id, payload) → decoded metadata + features, payload dropped."""
    return ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def sample_frames(
    ds: ray.data.Dataset, *, every_n: int = 10, batch_size: int = 32, concurrency: int | tuple = (1, 2)
) -> ray.data.Dataset:
    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
