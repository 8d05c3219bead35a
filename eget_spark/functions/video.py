"""Video columns: frame container parse + frame sampling, stdlib-only.

Engine extension for the interleaved text+media payload (SURVEY.md §2.12):
the reference treats media as opaque blobs (services/crawler/
crawler_service.py) and has no video handling; a multimodal training
pipeline needs typed video metadata and per-frame sampling (every k-th
frame -> image features) at 100 TB.  No stdlib video codec exists (same
constraint class as JPEG, functions/media.py:174), so the DECODE target
is a deliberately simple public-shape container — length-prefixed PNG
frames, the moral equivalent of MJPEG-in-AVI with PNG instead of JPEG —
which keeps every byte of the pipeline REAL: container parse, frame
extraction, and pixel decode (functions/png.py) all run stdlib-only.
A production deployment swaps ``iter_frames`` for an ffmpeg/PyAV call
behind the identical (media_ref, frame_idx, png_bytes) contract; the
Spark plumbing (schema, Arrow batching, zero-shuffle sampling, feature
join shape) is what this module pins and tests.

Container layout (big-endian):

    b"EVC1" | u32 n_frames | u32 fps_x1000 | n_frames x (u32 len | PNG)

Pinned integer contract (SQL-oracle-reproducible):

- ``duration_us = n_frames * 1_000_000_000 // fps_x1000``
- frame sampling keeps ``frame_idx % every == 0`` (0-based, so the
  first frame is always kept — the thumbnail convention)
- per-frame ``pix_total`` = sum of all channel bytes of the decoded
  frame (int64; 2^31 pixels/frame stays < 2^63)

Spark shape, scale-first: ONE ``mapInPandas`` pass per operator —
header probe never touches frame bytes; sampling decodes ONLY the kept
frames (the u32 length prefix lets the parser skip dropped frames
without decompressing them, the property a real container gives you).
Zero shuffle either way; undecodable payloads are dropped (quarantine
by anti-join, same contract as operators/image_dedup.py).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from eget_spark.functions.png import decode_png, encode_png

MAGIC = b"EVC1"

_PROBE_SCHEMA = (
    "media_ref string, n_frames int, fps_x1000 int, duration_us long"
)
_FRAME_SCHEMA = (
    "media_ref string, frame_idx int, width int, height int, pix_total long"
)


def encode_video(frames: list["np.ndarray"], fps_x1000: int) -> bytes:
    """Pack uint8 frame arrays as an EVC1 payload (PNG per frame)."""
    out = [MAGIC, struct.pack(">II", len(frames), fps_x1000)]
    for arr in frames:
        png = encode_png(arr)
        out.append(struct.pack(">I", len(png)))
        out.append(png)
    return b"".join(out)


def probe_video(data: bytes) -> tuple[int, int]:
    """(n_frames, fps_x1000) from the 12-byte header; raises if not EVC1."""
    if len(data) < 12 or data[:4] != MAGIC:
        raise ValueError("not an EVC1 payload")
    n_frames, fps_x1000 = struct.unpack(">II", data[4:12])
    if fps_x1000 <= 0:
        raise ValueError("bad fps")
    return n_frames, fps_x1000


def iter_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (frame_idx, png_bytes); skipping is O(1) per frame."""
    n_frames, _ = probe_video(data)
    pos = 12
    for idx in range(n_frames):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        yield idx, data[pos : pos + ln]
        pos += ln


def video_probe(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_ref, payload) -> header metadata rows; frame bytes untouched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, payload in zip(b["media_ref"], b[payload_col]):
                if payload is None:
                    continue
                try:
                    nf, fps = probe_video(bytes(payload))
                except Exception:
                    continue
                rows.append((ref, nf, fps, nf * 1_000_000_000 // fps))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "n_frames", "fps_x1000", "duration_us"],
            )

    return media.select("media_ref", payload_col).mapInPandas(
        run, _PROBE_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every: int = 10, payload_col: str = "payload"
) -> DataFrame:
    """Keep every ``every``-th frame (idx % every == 0), decode ONLY those,
    emit (media_ref, frame_idx, width, height, pix_total).  Dropped frames
    are length-skipped, never decompressed."""
    if every < 1:
        raise ValueError("every must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, payload in zip(b["media_ref"], b[payload_col]):
                if payload is None:
                    continue
                try:
                    for idx, png in iter_frames(bytes(payload)):
                        if idx % every:
                            continue
                        arr = decode_png(png)
                        h, w = arr.shape[0], arr.shape[1]
                        rows.append(
                            (ref, idx, w, h, int(arr.astype(np.int64).sum()))
                        )
                except Exception:
                    continue
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "frame_idx", "width", "height", "pix_total",
                ],
            )

    return media.select("media_ref", payload_col).mapInPandas(
        run, _FRAME_SCHEMA
    )
