"""Multimodal column plumbing: schema, determinism, decode/features/resize/
frame-sampling dataflow (codecs stubbed by design — FIXTURES.md X19)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.functions.media import (
    decode_media,
    media_features,
    resize_images,
    sample_frames,
    synth_media,
)


def test_media_roundtrip_and_determinism(spark):
    m1 = synth_media(spark, 64).collect()
    m2 = synth_media(spark, 64).collect()
    assert sorted(r["media_ref"] for r in m1) == sorted(r["media_ref"] for r in m2)
    d = {r["media_ref"]: r for r in decode_media(synth_media(spark, 64)).collect()}
    for r in m1:
        dec = d[r["media_ref"]]
        assert (dec["width"], dec["height"], dec["n_frames"]) == (
            r["meta"]["width"], r["meta"]["height"], r["meta"]["n_frames"]
        )
        assert dec["kind"] == r["kind"]


def test_media_features_stable_and_shaped(spark):
    f1 = {r["media_ref"]: r["features"] for r in media_features(synth_media(spark, 32)).collect()}
    f2 = {r["media_ref"]: r["features"] for r in media_features(synth_media(spark, 32)).collect()}
    assert f1 == f2
    assert all(len(v) == 16 and all(0.0 <= x <= 1.0 for x in v) for v in f1.values())


def test_resize_rule(spark):
    out = {r["media_ref"]: r for r in resize_images(synth_media(spark, 64), 100).collect()}
    src = {r["media_ref"]: r for r in synth_media(spark, 64).collect()}
    import math

    for ref, r in out.items():
        w, h = src[ref]["meta"]["width"], src[ref]["meta"]["height"]
        if max(w, h) > 100:
            scale = math.sqrt(100.0 / max(w, h))
            assert r["width"] == int(w * scale) and r["height"] == int(h * scale)
        else:
            assert (r["width"], r["height"]) == (w, h)


def test_frame_sampling(spark):
    media = synth_media(spark, 90)
    frames = sample_frames(media, every=7).collect()
    src = {r["media_ref"]: r["meta"]["n_frames"] for r in media.collect()}
    assert frames
    seen = {}
    for fr in frames:
        assert fr["frame_idx"] % 7 == 0
        assert fr["frame_idx"] < src[fr["media_ref"]]
        assert fr["frame_ref"] == f"{fr['media_ref']}#{fr['frame_idx']}"
        seen.setdefault(fr["media_ref"], []).append(fr["frame_idx"])
    for ref, idxs in seen.items():
        assert sorted(idxs) == list(range(0, src[ref], 7))


def test_media_joins_corpus_image_spans(spark, docs_small):
    """media_ref format matches the corpus image spans' ref namespace."""
    refs = docs_small.select(
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("image"))
        ).alias("s")
    ).select(F.col("s.media_ref").alias("media_ref"))
    assert refs.where(~F.col("media_ref").startswith("img://")).count() == 0


def test_reencode_gate_and_pil_roundtrip(spark):
    """X19 real path: NotImplementedError without PIL; real PNG/JPEG
    roundtrip (size-triggered sqrt resize, data-URI shape) when present."""
    import importlib.util

    import pytest

    from eget_spark.functions.media import encode_image_data_uri, reencode_images

    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(NotImplementedError):
            encode_image_data_uri(b"\x89PNG....")
        return
    import base64
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (400, 200), (10, 20, 30)).save(buf, format="PNG")
    raw = buf.getvalue()
    uri = encode_image_data_uri(raw, "PNG", max_size_kb=500)
    assert uri.startswith("data:image/png;base64,")
    img2 = Image.open(io.BytesIO(base64.b64decode(uri.split(",", 1)[1])))
    assert img2.size == (400, 200)  # under the cap: no resize
    # oversized source -> sqrt scale (reference file_utils.py:48-54)
    big = io.BytesIO()
    Image.frombytes(
        "RGB", (800, 600), bytes(range(256)) * (800 * 600 * 3 // 256)
    ).save(big, format="PNG")
    raw_big = big.getvalue()
    if len(raw_big) / 1024 > 4:
        uri2 = encode_image_data_uri(raw_big, "PNG", max_size_kb=4)
        scale = (4 / (len(raw_big) / 1024)) ** 0.5
        img3 = Image.open(
            io.BytesIO(base64.b64decode(uri2.split(",", 1)[1]))
        )
        assert img3.size == (int(800 * scale), int(600 * scale))
