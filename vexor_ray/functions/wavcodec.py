"""From-scratch WAV (RIFF/WAVE) parsing incl. compressed telephony codecs.

The stdlib ``wave`` module reads only PCM.  This parser also decodes the
compressed formats that actually appear in crawled audio corpora and are
FULLY specified by public standards with no licensing or table ambiguity:

- ``fmt 1``  — PCM 8-bit unsigned / 16-bit signed (bit-identical to the
  stdlib path it replaces),
- ``fmt 6``  — G.711 A-law (ITU-T G.711: segment/mantissa expansion),
- ``fmt 7``  — G.711 µ-law (bias-132 expansion),
- ``fmt 17`` — IMA/DVI ADPCM (IMA ADPCM reference algorithm: 89-entry
  step table, 4-bit nibbles, per-block predictor reset — the reset makes
  every block independently decodable, i.e. seekable at block granularity).

Anything else (MP3 frames inside WAV, GSM, float PCM…) returns None and
callers keep their documented stub/refusal behavior.  ``make_wav``
authors fixtures in every supported format so round-trips are testable
without external files.
"""

from __future__ import annotations

import struct

import numpy as np

# IMA ADPCM reference tables (IMA "Recommended Practices for Enhancing
# Digital Audio Compatibility", public; identical in every implementation)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
        494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
        1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
        4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
        11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
        27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def ulaw_decode(b: np.ndarray) -> np.ndarray:
    """G.711 µ-law bytes → int16 linear (bias-132 expansion)."""
    u = (~b.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -x, x).astype(np.int16)


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear → G.711 µ-law bytes (segment search, bias 132)."""
    x = x.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x) + 0x84, 0x7FFF)
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16 linear (0x55 toggle + segment expansion)."""
    a = (b.astype(np.int32) ^ 0x55) & 0xFF
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    x = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
    )
    # A-law sign convention is inverted vs µ-law: MSB SET (after the 0x55
    # toggle) means positive
    return np.where(sign != 0, x, -x).astype(np.int16)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear → G.711 A-law bytes."""
    x = x.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0)  # A-law: MSB set = positive
    mag = np.minimum(np.abs(x), 0x7FFF)
    exp = (np.floor(np.log2(np.maximum(mag, 1))) - 7).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


def ima_adpcm_decode_block(
    data: bytes, nch: int, block_align: int
) -> np.ndarray:
    """One IMA ADPCM block → (samples, nch) int16.

    Block layout (WAV/DVI): per channel a 4-byte header (int16 predictor,
    uint8 step index, reserved), then 4-byte channel-interleaved groups of
    eight 4-bit nibbles (low nibble first).
    """
    n_samples = (block_align - 4 * nch) * 2 // nch + 1
    out = np.empty((n_samples, nch), dtype=np.int16)
    preds = np.empty(nch, dtype=np.int32)
    idxs = np.empty(nch, dtype=np.int32)
    for c in range(nch):
        pred, idx = struct.unpack_from("<hB", data, 4 * c)
        preds[c], idxs[c] = pred, min(max(idx, 0), 88)
        out[0, c] = pred
    body = np.frombuffer(data, dtype=np.uint8, offset=4 * nch)
    # nibble stream per channel: groups of 4 bytes rotate across channels
    groups = body.reshape(-1, nch, 4)  # (g, ch, 4 bytes)
    for c in range(nch):
        byts = groups[:, c, :].reshape(-1)
        nibs = np.empty(byts.size * 2, dtype=np.uint8)
        nibs[0::2] = byts & 0x0F
        nibs[1::2] = byts >> 4
        pred, idx = int(preds[c]), int(idxs[c])
        for i, code in enumerate(nibs[: n_samples - 1]):
            step = int(_IMA_STEPS[idx])
            diff = step >> 3
            if code & 1:
                diff += step >> 2
            if code & 2:
                diff += step >> 1
            if code & 4:
                diff += step
            pred = pred - diff if code & 8 else pred + diff
            pred = min(max(pred, -32768), 32767)
            idx = min(max(idx + int(_IMA_INDEX[code & 7]), 0), 88)
            out[i + 1, c] = pred
    return out


def ima_adpcm_encode_block(samples: np.ndarray, block_align: int) -> bytes:
    """(samples, nch) int16 → one IMA ADPCM block (fixture authoring)."""
    n, nch = samples.shape
    want = (block_align - 4 * nch) * 2 // nch + 1
    if n < want:  # pad the tail block by repeating the last sample
        samples = np.vstack([samples, np.repeat(samples[-1:], want - n, axis=0)])
    head = b""
    nib_cols = []
    for c in range(nch):
        x = samples[:, c].astype(np.int32)
        pred, idx = int(x[0]), 0
        head += struct.pack("<hBB", pred, idx, 0)
        nibs = np.empty(want - 1, dtype=np.uint8)
        for i in range(want - 1):
            step = int(_IMA_STEPS[idx])
            delta = int(x[i + 1]) - pred
            code = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                code |= 4
                delta -= step
            if delta >= step >> 1:
                code |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                code |= 1
            # reconstruct exactly like the decoder
            diff = step >> 3
            if code & 1:
                diff += step >> 2
            if code & 2:
                diff += step >> 1
            if code & 4:
                diff += step
            pred = pred - diff if code & 8 else pred + diff
            pred = min(max(pred, -32768), 32767)
            idx = min(max(idx + int(_IMA_INDEX[code & 7]), 0), 88)
            nibs[i] = code
        packed = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
        nib_cols.append(packed.reshape(-1, 4))
    inter = np.stack(nib_cols, axis=1)  # (groups, nch, 4)
    return head + inter.tobytes()


def parse_wav(payload: bytes) -> dict | None:
    """WAV bytes → {rate, n_channels, n_frames, samples: (n, nch) int16}.

    Supports PCM 8/16-bit, A-law, µ-law and IMA ADPCM; None otherwise.
    """
    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            tag, nch, rate, _, align, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
            fmt = {
                "tag": tag,
                "nch": nch,
                "rate": rate,
                "align": align,
                "bits": bits,
            }
        elif cid == b"data":
            data = payload[body : body + size]
        pos = body + size + (size & 1)
    if fmt is None or data is None or fmt["nch"] < 1 or fmt["rate"] < 1:
        return None
    nch = fmt["nch"]
    if fmt["tag"] == 1 and fmt["bits"] == 16:
        x = np.frombuffer(data, dtype="<i2")
        x = x[: (x.size // nch) * nch].reshape(-1, nch)
    elif fmt["tag"] == 1 and fmt["bits"] == 8:
        u = np.frombuffer(data, dtype=np.uint8)
        x = ((u.astype(np.int32) - 128) << 8).astype(np.int16)
        x = x[: (x.size // nch) * nch].reshape(-1, nch)
    elif fmt["tag"] == 6:
        x = alaw_decode(np.frombuffer(data, dtype=np.uint8))
        x = x[: (x.size // nch) * nch].reshape(-1, nch)
    elif fmt["tag"] == 7:
        x = ulaw_decode(np.frombuffer(data, dtype=np.uint8))
        x = x[: (x.size // nch) * nch].reshape(-1, nch)
    elif fmt["tag"] == 17:
        align = fmt["align"]
        if align < 4 * nch + 4:
            return None
        blocks = [
            ima_adpcm_decode_block(data[o : o + align], nch, align)
            for o in range(0, len(data) - align + 1, align)
        ]
        if not blocks:
            return None
        x = np.vstack(blocks)
    else:
        return None
    return {
        "rate": int(fmt["rate"]),
        "n_channels": nch,
        "n_frames": int(x.shape[0]),
        "samples": x,
    }


def make_wav(
    samples: np.ndarray,
    rate: int,
    fmt: str = "pcm16",
    block_align: int = 256,
) -> bytes:
    """(n, nch) int16 → WAV bytes in pcm16 / pcm8 / alaw / ulaw / ima."""
    samples = np.atleast_2d(np.asarray(samples, dtype=np.int16))
    if samples.shape[0] == 1 and samples.shape[1] > samples.shape[0]:
        samples = samples.T
    n, nch = samples.shape
    if fmt == "pcm16":
        tag, bits, align = 1, 16, 2 * nch
        data = samples.astype("<i2").tobytes()
    elif fmt == "pcm8":
        tag, bits, align = 1, 8, nch
        data = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    elif fmt == "alaw":
        tag, bits, align = 6, 8, nch
        data = alaw_encode(samples.reshape(-1)).tobytes()
    elif fmt == "ulaw":
        tag, bits, align = 7, 8, nch
        data = ulaw_encode(samples.reshape(-1)).tobytes()
    elif fmt == "ima":
        tag, bits, align = 17, 4, block_align
        per_block = (block_align - 4 * nch) * 2 // nch + 1
        parts = [
            ima_adpcm_encode_block(samples[o : o + per_block], block_align)
            for o in range(0, n, per_block)
        ]
        data = b"".join(parts)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    fmt_body = struct.pack("<HHIIHH", tag, nch, rate, rate * align, align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
