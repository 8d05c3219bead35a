"""EVC1 video container + frame sampling tests (functions/video.py)."""

import numpy as np
import pytest

from eget_spark.functions.video import (
    encode_video,
    iter_frames,
    probe_video,
    sample_video_frames,
    video_probe,
)


def _frames(n, w=8, h=8, bump=0):
    return [
        ((np.add.outer(np.arange(h), np.arange(w)) + f * 3 + bump) % 256)
        .astype(np.uint8)
        for f in range(n)
    ]


def test_probe_and_iter():
    data = encode_video(_frames(5), fps_x1000=24000)
    assert probe_video(data) == (5, 24000)
    idxs = [i for i, _ in iter_frames(data)]
    assert idxs == [0, 1, 2, 3, 4]


def test_probe_rejects_non_evc1():
    with pytest.raises(ValueError):
        probe_video(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        probe_video(b"EVC1\x00")  # truncated header


def test_duration_floor():
    data = encode_video(_frames(3), fps_x1000=7000)  # 3 frames at 7 fps
    n, fps = probe_video(data)
    assert n * 1_000_000_000 // fps == 428571


def test_distributed_probe_and_sampling(spark):
    vids = [
        ("v0", bytearray(encode_video(_frames(6, w=8, h=8), 30000))),
        ("v1", bytearray(encode_video(_frames(4, w=16, h=8, bump=9), 12000))),
        ("bad", bytearray(b"not a video")),
        ("null", None),
    ]
    df = spark.createDataFrame(vids, "media_ref string, payload binary")

    probe = {r["media_ref"]: r.asDict() for r in video_probe(df).collect()}
    assert set(probe) == {"v0", "v1"}
    assert probe["v0"]["n_frames"] == 6
    assert probe["v0"]["duration_us"] == 6 * 1_000_000_000 // 30000

    samp = sample_video_frames(df, every=2).collect()
    by_vid = {}
    for r in samp:
        by_vid.setdefault(r["media_ref"], []).append(r)
    assert sorted(x["frame_idx"] for x in by_vid["v0"]) == [0, 2, 4]
    assert sorted(x["frame_idx"] for x in by_vid["v1"]) == [0, 2]
    v1f0 = next(x for x in by_vid["v1"] if x["frame_idx"] == 0)
    assert (v1f0["width"], v1f0["height"]) == (16, 8)
    # pix_total matches the closed-form gradient sum
    expect = sum(
        (y + x + 9) % 256 for y in range(8) for x in range(16)
    )
    assert v1f0["pix_total"] == expect


def test_sampling_every_one_keeps_all(spark):
    df = spark.createDataFrame(
        [("v", bytearray(encode_video(_frames(3), 1000)))],
        "media_ref string, payload binary",
    )
    assert sample_video_frames(df, every=1).count() == 3
    with pytest.raises(ValueError):
        sample_video_frames(df, every=0)
