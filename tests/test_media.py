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
