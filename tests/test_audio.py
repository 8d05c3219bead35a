"""WAV decode + feature tests (functions/audio.py)."""

import numpy as np
import pytest

from eget_spark.functions.audio import (
    audio_features,
    decode_wav,
    encode_wav,
    wav_features_bytes,
)


def test_roundtrip_mono():
    s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int64)
    data = encode_wav(s, 8000, 1)
    rate, ch, out = decode_wav(data)
    assert (rate, ch) == (8000, 1)
    assert out.tolist() == s.tolist()


def test_roundtrip_stereo_interleaved():
    s = np.array([1, -1, 2, -2, 3, -3, 4, -4], dtype=np.int64)
    rate, ch, out = decode_wav(encode_wav(s, 44100, 2))
    assert (rate, ch) == (44100, 2)
    assert out.tolist() == s.tolist()


def test_features_pinned_contract():
    # mono: [5, -3, 0, 2, -2] -> crossings at (5,-3) and (2,-2) only:
    # zero breaks the (-3 .. 2) run (strict product rule)
    f = wav_features_bytes(
        encode_wav(np.array([5, -3, 0, 2, -2]), 10000, 1)
    )
    assert f == {
        "sample_rate": 10000,
        "n_channels": 1,
        "n_frames": 5,
        "duration_us": 500,
        "sum_abs": 12,
        "peak_abs": 5,
        "zero_crossings": 2,
    }


def test_features_stereo_per_channel_crossings():
    # frames (L,R): (1,-1), (-1,1), (2,3) -> L flips twice (1,-1 then
    # -1,2), R flips once (-1,1; then 1,3 stays positive)
    s = np.array([1, -1, -1, 1, 2, 3])
    f = wav_features_bytes(encode_wav(s, 8000, 2))
    assert f["n_channels"] == 2
    assert f["n_frames"] == 3
    assert f["zero_crossings"] == 3
    assert f["sum_abs"] == 9
    assert f["duration_us"] == 3 * 1_000_000 // 8000


def test_non_16bit_rejected():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode_wav(buf.getvalue())


def test_distributed_features_drop_undecodable(spark):
    rows = [
        ("a", bytearray(encode_wav(np.array([1, -1, 1, -1]), 8000, 1))),
        ("b", bytearray(encode_wav(np.array([0, 0]), 16000, 2))),
        ("junk", bytearray(b"RIFFnope")),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {r["media_ref"]: r.asDict() for r in audio_features(df).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["zero_crossings"] == 3
    assert out["b"]["n_frames"] == 1
    assert out["b"]["sum_abs"] == 0
