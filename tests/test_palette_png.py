"""Palette + sub-byte-depth PNG decode (functions/png.py)."""

import numpy as np
import pytest

from eget_spark.functions.png import (
    decode_png,
    encode_palette_png,
    encode_png,
    png_size,
)

PAL = np.array(
    [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
)


def test_palette_roundtrip_all_depths():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 3, 0]], dtype=np.uint8)
    for d in (2, 4, 8):
        out = decode_png(encode_palette_png(idx, PAL, depth=d))
        assert out.shape == (3, 4, 3)
        assert (out == PAL[idx]).all()


def test_depth1_with_pad_bits():
    idx = np.array([[0, 1, 1, 0, 1, 0, 1, 1, 0]], dtype=np.uint8)  # w=9
    out = decode_png(encode_palette_png(idx, PAL[:2], depth=1))
    assert out.shape == (1, 9, 3)
    assert (out == PAL[:2][idx]).all()


def test_trns_alpha_padded_opaque():
    idx = np.array([[0, 1, 2, 3]], dtype=np.uint8)
    out = decode_png(encode_palette_png(idx, PAL, depth=4, trns=bytes([7, 255])))
    assert out.shape == (1, 4, 4)
    assert list(out[0, :, 3]) == [7, 255, 255, 255]


def test_grayscale_subbyte_scaling():
    # depth-2 gray: levels 0..3 scale by 85
    import struct
    import zlib

    from eget_spark.functions.png import _SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", 4, 1, 2, 0, 0, 0, 0)
    row = b"\x00" + bytes([0b00011011])  # 0,1,2,3
    data = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(row))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.tolist() == [[0, 85, 170, 255]]


def test_palette_missing_plte_rejected():
    idx = np.array([[0]], dtype=np.uint8)
    data = bytearray(encode_palette_png(idx, PAL[:1]))
    # excise the PLTE chunk
    i = bytes(data).find(b"PLTE")
    out = bytes(data[: i - 4]) + bytes(data[i + 7 + 4 + 1 :])
    # (crude splice may corrupt downstream; decode must raise either way)
    with pytest.raises(Exception):
        decode_png(out)


def test_index_out_of_range_rejected():
    with pytest.raises(ValueError):
        encode_palette_png(np.array([[5]], dtype=np.uint8), PAL[:2], depth=4)


def test_size_probe_and_legacy_paths_unchanged():
    idx = np.zeros((2, 7), dtype=np.uint8)
    assert png_size(encode_palette_png(idx, PAL[:1], depth=1)) == (7, 2)
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert (decode_png(encode_png(g)) == g).all()
