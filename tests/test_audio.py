"""Real PCM-WAV decode through the multimodal audio stage."""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa


def _wav_bytes(x: np.ndarray, rate: int = 8000, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((x * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_decode_audio_real_wav(ray_session):
    import ray.data

    from vexor_ray.functions.multimodal import decode_audio

    t = np.arange(8000) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)  # 1 s of A440 at half scale
    silence = np.zeros(4000)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], type=pa.int64()),
                "payload": pa.array(
                    [_wav_bytes(sine), _wav_bytes(silence), b"notawav"],
                    type=pa.binary(),
                ),
            }
        )
    )
    out = decode_audio(ds, concurrency=1).to_pandas().set_index("id")
    assert out.loc[1, "sample_rate"] == 8000
    assert out.loc[1, "duration_s"] == 1.0
    # RMS of a half-scale sine ≈ 0.5/sqrt(2)
    assert abs(out.loc[1, "rms"] - 0.5 / np.sqrt(2)) < 1e-3
    # 440 Hz crosses zero ~880 times per second
    assert 850 <= out.loc[1, "zero_crossings"] <= 910
    assert out.loc[2, "rms"] == 0.0
    assert out.loc[2, "duration_s"] == 0.5
    # non-WAV → deterministic fake, still typed rows
    assert out.loc[3, "sample_rate"] >= 8000
