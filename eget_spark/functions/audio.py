"""Audio columns: REAL WAV (RIFF PCM) decode + signal features, stdlib-only.

Engine extension for the interleaved text+media payload (SURVEY.md §2.12):
the reference stores media as opaque base64 blobs
(services/crawler/crawler_service.py screenshot path) and never decodes
audio; a 100-TB multimodal training pipeline needs typed audio features
(sample rate, duration, loudness, silence/zero-crossing stats) for
filtering and dedup.  Python's stdlib ``wave`` module is a complete
RIFF/WAVE PCM codec, so — unlike JPEG (functions/media.py) — the audio
path runs REAL bytes end-to-end with no third-party libs, same as the
stdlib PNG path (functions/png.py).

Pinned integer feature contract (so a SQL oracle can reproduce it):

- samples are signed 16-bit PCM; multi-channel frames interleave
  channel-major within a frame (WAV layout); flat sample index
  ``j = t * n_channels + c`` for frame t, channel c
- ``duration_us = n_frames * 1_000_000 // sample_rate`` (integer floor)
- ``sum_abs`` / ``peak_abs``: over ALL samples (every channel)
- ``zero_crossings``: per-channel count of adjacent-frame strict sign
  flips (``s[t-1] * s[t] < 0``), summed over channels — zeros break a
  run (no crossing), matching the strict-product definition

All sums are int64 (|s| <= 32768, so 10^9-sample files stay < 2^63).

Spark shape, scale-first: ONE ``mapInPandas`` pass over (media_ref,
payload) — Arrow-batched, payload pruned immediately after; undecodable
payloads are dropped (quarantine by anti-join, same contract as
operators/image_dedup.py).  No shuffle: every file decodes where it
sits, so the operator scales linearly with input splits.
"""

from __future__ import annotations

import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_FEATURES_SCHEMA = (
    "media_ref string, sample_rate int, n_channels int, n_frames long, "
    "duration_us long, sum_abs long, peak_abs long, zero_crossings long"
)


def encode_wav(samples: "np.ndarray", rate: int, channels: int = 1) -> bytes:
    """Encode int16 samples (flat, channel-interleaved) as WAV bytes via
    the stdlib ``wave`` writer.  len(samples) must divide by channels."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.size % channels:
        raise ValueError("sample count not a multiple of channels")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """(sample_rate, n_channels, flat int64 samples) of one WAV payload.
    Only 16-bit PCM is accepted (the pinned contract above); other
    widths raise, and callers treat that as undecodable."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate, ch, nf = w.getframerate(), w.getnchannels(), w.getnframes()
        raw = w.readframes(nf)
    return rate, ch, np.frombuffer(raw, dtype="<i2").astype(np.int64)


def wav_features_bytes(data: bytes) -> dict:
    """The pinned feature tuple of one WAV payload (see module header)."""
    rate, ch, s = decode_wav(data)
    nf = s.size // ch
    if ch > 1:
        per_ch = s.reshape(nf, ch)
    else:
        per_ch = s[:, None]
    # strict sign-flip count per channel, summed
    zc = int(((per_ch[1:] * per_ch[:-1]) < 0).sum()) if nf > 1 else 0
    return {
        "sample_rate": int(rate),
        "n_channels": int(ch),
        "n_frames": int(nf),
        "duration_us": int(nf) * 1_000_000 // int(rate),
        "sum_abs": int(np.abs(s).sum()),
        "peak_abs": int(np.abs(s).max()) if s.size else 0,
        "zero_crossings": zc,
    }


def audio_features(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_ref, payload) -> pinned WAV feature rows; undecodable
    payloads dropped.  One Arrow pass, zero shuffle."""
    cols = ["media_ref", payload_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, payload in zip(b["media_ref"], b[payload_col]):
                if payload is None:
                    continue
                try:
                    f = wav_features_bytes(bytes(payload))
                except Exception:
                    continue
                rows.append(
                    (
                        ref,
                        f["sample_rate"],
                        f["n_channels"],
                        f["n_frames"],
                        f["duration_us"],
                        f["sum_abs"],
                        f["peak_abs"],
                        f["zero_crossings"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref",
                    "sample_rate",
                    "n_channels",
                    "n_frames",
                    "duration_us",
                    "sum_abs",
                    "peak_abs",
                    "zero_crossings",
                ],
            )

    return media.select(*cols).mapInPandas(run, _FEATURES_SCHEMA)
