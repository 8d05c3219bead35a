"""GIF codec (functions/gif.py): LZW + container roundtrips against the
deterministic encoder, plus decode-contract edge cases."""

from __future__ import annotations

import random

import numpy as np
import pytest

from eget_spark.functions.gif import (
    decode_gif,
    encode_gif,
    lzw_decode_gif,
    lzw_encode_gif,
)


def _pal(n):
    return np.array(
        [[(p * 37 + 5) % 256, (p * 53 + 11) % 256, (p * 71 + 17) % 256]
         for p in range(n)],
        dtype=np.uint8,
    )


def test_lzw_roundtrip_widths_and_runs():
    random.seed(7)
    for mcs in (2, 3, 4, 7, 8):
        nvals = 1 << mcs
        for trial in range(9):
            n = random.randint(0, 6000)
            if trial % 3 == 0:
                data = bytes(random.randrange(nvals) for _ in range(n))
            elif trial % 3 == 1:
                data = bytes([trial % nvals]) * n  # KwKwK max-run stress
            else:
                data = bytes((i * i + trial) % nvals for i in range(n))
            assert lzw_decode_gif(lzw_encode_gif(data, mcs), mcs) == data


def test_lzw_roundtrip_through_table_full_clear():
    # mcs=2: the 12-bit table fills fast; the encoder must emit CLEAR and
    # the decoder must resync — >4096 dictionary entries worth of data
    data = bytes((i * 7 + i // 3) % 4 for i in range(60000))
    assert lzw_decode_gif(lzw_encode_gif(data, 2), 2) == data


def test_container_roundtrip_palette_transparency_interlace():
    random.seed(11)
    for trial in range(12):
        h, w = random.randint(1, 40), random.randint(1, 40)
        npal = random.choice([3, 4, 7, 16, 200])
        pal = _pal(npal)
        idx = np.fromfunction(
            lambda y, x: (y * 3 + x * 5 + trial) % npal, (h, w)
        ).astype(np.uint8)
        tr = npal - 1 if trial % 3 == 1 else -1
        il = trial % 4 == 2
        arr = decode_gif(encode_gif(idx, pal, transparent=tr, interlaced=il))
        if tr >= 0:
            assert arr.shape == (h, w, 4)
            assert np.array_equal(arr[:, :, :3], pal[idx])
            assert np.array_equal(arr[:, :, 3] == 0, idx == tr)
        else:
            assert arr.shape == (h, w, 3)
            assert np.array_equal(arr, pal[idx])


def test_interlace_actually_reorders_rows():
    # encode interlaced, then decode the SAME bytes pretending they are
    # sequential: rows must differ (the weave is real, not a no-op)
    pal = _pal(4)
    idx = np.arange(16 * 4, dtype=np.uint8).reshape(16, 4) % 4
    woven = encode_gif(idx, pal, interlaced=True)
    plain = encode_gif(idx, pal, interlaced=False)
    assert woven != plain
    assert np.array_equal(decode_gif(woven), decode_gif(plain))


def test_first_frame_only_for_animations():
    pal = _pal(4)
    f0 = encode_gif(np.zeros((3, 3), dtype=np.uint8), pal)
    f1 = encode_gif(np.full((3, 3), 2, dtype=np.uint8), pal)
    # splice: header+GCT+image of f0, then image block of f1, trailer
    animated = f0[:-1] + f1[13 + 12 :]
    arr = decode_gif(animated)
    assert np.array_equal(arr, np.broadcast_to(pal[0], (3, 3, 3)))


def test_decode_rejects_garbage_and_truncation():
    pal = _pal(4)
    good = encode_gif(np.zeros((4, 4), dtype=np.uint8), pal)
    for bad in (b"not an image", b"GIF89a\x00\x01", good[:20]):
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_pixel_checksums_dispatch_png_and_gif(spark):
    from eget_spark.functions.media import image_pixel_checksums
    from eget_spark.functions.png import encode_palette_png

    pal = _pal(4)
    idx = (np.arange(32, dtype=np.uint8).reshape(4, 8)) % 4
    rows = [
        ("g0", bytearray(encode_gif(idx, pal))),
        ("p0", bytearray(encode_palette_png(idx, pal, 8, None))),
        ("x0", bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {r.media_ref: r for r in image_pixel_checksums(df).collect()}
    assert set(got) == {"g0", "p0"}  # junk quarantined
    # both formats decode to the SAME pixels -> identical checksums
    g, p = got["g0"], got["p0"]
    assert (g.width, g.height, g.channels) == (8, 4, 3)
    assert (g.pix_total, g.pos_weighted) == (p.pix_total, p.pos_weighted)
    want_pw = int(
        (np.arange(32) * pal[idx.ravel(), 0].astype(np.int64)).sum()
    )
    assert g.pos_weighted == want_pw


def test_lzw_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        st.integers(2, 8).flatmap(
            lambda m: st.tuples(
                st.just(m),
                st.lists(st.integers(0, (1 << m) - 1), max_size=1500),
            )
        )
    )
    def check(args):
        mcs, vals = args
        data = bytes(vals)
        assert lzw_decode_gif(lzw_encode_gif(data, mcs), mcs) == data

    check()


def test_container_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pal = _pal(16)

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 24),
        st.integers(1, 24),
        st.integers(0, 10**9),
        st.booleans(),
        st.integers(-1, 15),
    )
    def check(h, w, seed, interlaced, transparent):
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
        arr = decode_gif(
            encode_gif(idx, pal, transparent=transparent, interlaced=interlaced)
        )
        if transparent >= 0:
            assert np.array_equal(arr[:, :, :3], pal[idx])
            assert np.array_equal(arr[:, :, 3] == 0, idx == transparent)
        else:
            assert np.array_equal(arr, pal[idx])

    check()
