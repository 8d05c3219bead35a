"""Perceptual image dedup (aHash over real PNG pixels): distributed path
vs the driver-side twin, pigeonhole completeness vs brute force, and
component/canonical semantics."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from eget_spark.functions.png import decode_png, encode_png, resize_nearest
from eget_spark.operators.dedup import hamming_pairs
from eget_spark.operators.image_dedup import (
    ahash_bytes,
    dedup_images,
    image_ahash,
    near_dup_image_pairs,
)


def _gradient(w: int, h: int, a: int, b: int, c: int) -> np.ndarray:
    return (
        (np.arange(h)[:, None] * a + np.arange(w)[None, :] * b + c) % 256
    ).astype(np.uint8)


def _py_ahash_bits(arr: np.ndarray, s: int = 8) -> str:
    """Independent brute-force recompute of the pinned recipe."""
    if arr.ndim == 3:
        gray = arr.astype(np.int64).sum(axis=2) // arr.shape[2]
    else:
        gray = arr.astype(np.int64)
    if gray.shape != (s, s):
        gray = resize_nearest(gray, s, s)
    flat = gray.reshape(-1)
    total = int(flat.sum())
    return "".join("1" if int(p) * s * s > total else "0" for p in flat)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(18):
        g, v = i // 3, i % 3
        a = 1 + g % 3
        b = 1 + g % 4
        c = (g * 11) % 40
        w = 8 * (1 + g % 4)
        h = 8 * (1 + g % 3)
        arr = _gradient(w, h, a, b, c).astype(np.int64)
        if v == 1:
            arr = arr + 1  # uniform brightness: aHash-invariant (no wrap)
        elif v == 2:
            bump = (np.add.outer(np.arange(h), np.arange(w)) % 9 == 0) * 60
            arr = arr + bump  # flips some bits
        rows.append((f"img{i:03d}", bytearray(encode_png((arr % 256).astype(np.uint8)))))
    rows.append(("bad000", bytearray(b"not a png at all")))
    return spark.createDataFrame(rows, "media_ref string, payload binary")


def test_ahash_bytes_matches_bruteforce_gray_and_rgb():
    gray = _gradient(24, 16, 3, 5, 7)
    rgb = np.stack([gray, (gray + 40) % 256, (gray + 90) % 256], axis=2).astype(
        np.uint8
    )
    for arr in (gray, rgb):
        data = encode_png(arr)
        sig, bits = ahash_bytes(data)
        assert bits == _py_ahash_bits(decode_png(data))
        # packed signature: bit k at position k, two's complement on bit 63
        unsigned = sig % (1 << 64)
        assert bits == "".join(str((unsigned >> k) & 1) for k in range(64))


def test_ahash_constant_image_is_all_zero():
    flat = np.full((8, 8), 77, dtype=np.uint8)
    _, bits = ahash_bytes(encode_png(flat))
    assert bits == "0" * 64  # strict > means constant hashes to zero


def test_image_ahash_distributed_matches_driver_twin(spark, media):
    out = {
        r["media_ref"]: r
        for r in image_ahash(media).collect()
    }
    assert "bad000" not in out  # undecodable payloads dropped
    assert len(out) == 18
    for r in media.where(F.col("media_ref") != "bad000").collect():
        sig, bits = ahash_bytes(bytes(r["payload"]))
        got = out[r["media_ref"]]
        assert got["ahash"] == sig
        assert got["ahash_bits"] == bits
        arr = decode_png(bytes(r["payload"]))
        assert (got["height"], got["width"]) == arr.shape[:2]


def test_near_dup_pairs_match_bruteforce_all_pairs(spark, media):
    sigs = {
        r["media_ref"]: r["ahash_bits"] for r in image_ahash(media).collect()
    }
    expected = set()
    for (ia, ba), (ib, bb) in itertools.combinations(sorted(sigs.items()), 2):
        ham = sum(x != y for x, y in zip(ba, bb))
        if ham <= 3:
            expected.add((ia, ib, ham))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in near_dup_image_pairs(media).collect()
    }
    assert got == expected
    # brightness variant is hash-identical to its base image
    assert ("img000", "img001", 0) in got


def test_dedup_images_canonical_is_component_min(spark, media):
    pairs = [
        (r["id_a"], r["id_b"])
        for r in near_dup_image_pairs(media).collect()
    ]
    # union-find oracle
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[str, list[str]] = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    expected = {x: find(x) for x in parent}
    got = {
        r["media_ref"]: r["canonical"] for r in dedup_images(media).collect()
    }
    assert len(got) == 18
    for ref, canon in got.items():
        assert canon == expected.get(ref, ref)
    # at least one non-trivial group exists in the fixture
    assert any(v != k for k, v in got.items())


def test_hamming_pairs_pigeonhole_completeness(spark):
    # deterministic pseudo-random 64-bit signatures + planted near dups
    base = [(i * 0x9E3779B97F4A7C15) % (1 << 64) for i in range(40)]
    sigs = list(base)
    sigs.append(base[0] ^ 0b1)  # hamming 1
    sigs.append(base[1] ^ (1 << 63) ^ (1 << 5) ^ (1 << 40))  # hamming 3
    sigs.append(base[2])  # hamming 0
    rows = [
        (i, s - (1 << 64) if s >= 1 << 63 else s) for i, s in enumerate(sigs)
    ]
    df = spark.createDataFrame(rows, "id long, sig long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, "sig", 64, max_hamming=3, bands=4).collect()
    }
    expected = set()
    for (ia, sa), (ib, sb) in itertools.combinations(enumerate(sigs), 2):
        ham = bin(sa ^ sb).count("1")
        if ham <= 3:
            expected.add((ia, ib, ham))
    assert got == expected
    assert (0, 40, 1) in expected and (1, 41, 3) in expected and (2, 42, 0) in expected


def test_gif_and_png_same_pixels_same_group(spark):
    from eget_spark.functions.gif import encode_gif

    # the same indexed image written as GIF and as palette PNG must
    # produce IDENTICAL aHash signatures and land in one dedup group
    from eget_spark.functions.png import encode_palette_png

    pal = np.array(
        [[(p * 37 + 5) % 256, (p * 53 + 11) % 256, (p * 71 + 17) % 256]
         for p in range(4)],
        dtype=np.uint8,
    )
    idx = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 4
    other = (idx + 2) % 4  # different image -> different group
    rows = [
        ("gif_a", bytearray(encode_gif(idx, pal))),
        ("png_a", bytearray(encode_palette_png(idx, pal, 8, None))),
        ("gif_b", bytearray(encode_gif(other, pal))),
    ]
    media = spark.createDataFrame(rows, "media_ref string, payload binary")
    sigs = {r.media_ref: r.ahash_bits for r in image_ahash(media).collect()}
    assert sigs["gif_a"] == sigs["png_a"]
    groups = {
        r.media_ref: r.canonical
        for r in dedup_images(media, max_hamming=0).collect()
    }
    assert groups["gif_a"] == groups["png_a"]
    assert groups["gif_b"] != groups["gif_a"] or sigs.get("gif_b") == sigs["gif_a"]
