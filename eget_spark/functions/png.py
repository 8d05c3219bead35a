"""Minimal stdlib PNG codec (X19 support, SURVEY.md §2.8).

PNG is zlib-compressed filtered scanlines in CRC'd chunks, so a real
byte-level codec needs only ``zlib`` + ``struct`` + numpy: this module
decodes 8-bit gray/RGB/RGBA (all five scanline filters) and encodes
filter-0 PNGs, which upgrades the X19 image re-encode path
(functions/media.py — reference file_utils.py:38-75) from PIL-gated to
fully executable for PNG payloads.  JPEG encode/decode remains PIL-gated
(no stdlib JPEG codec exists); nearest-neighbor stands in for LANCZOS
resampling when PIL is absent — a documented divergence affecting pixel
values, not dimensions, data-URI framing, or the sqrt resize rule.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def png_size(data: bytes) -> tuple[int, int]:
    """(width, height) from IHDR without decoding pixel data."""
    if not is_png(data) or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        yield ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + payload + crc
        if ctype == b"IEND":
            return


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array (channels omitted for
    grayscale).  Supports bit depth 8, color types 0/2/4/6, no interlace."""
    if not is_png(data):
        raise ValueError("not a PNG")
    width = height = None
    channels = None
    idat = bytearray()
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += payload
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("bad scanline data length")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = arr[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        line = arr[y, 1:].astype(np.int32)
        f = int(filters[y])
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        cur = np.zeros(stride, dtype=np.int32)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            # Sub/Average/Paeth need the already-reconstructed left pixel:
            # sequential in x, vectorized across channels via bpp stride
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:  # Sub
                    cur[x] = (line[x] + a) & 0xFF
                elif f == 3:  # Average
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad filter {f}")
        out[y] = cur.astype(np.uint8)
    if channels == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, channels)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """(h, w[, channels]) uint8 array -> PNG bytes (filter 0 scanlines)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        channels, color = 1, 0
    elif arr.ndim == 3 and arr.shape[2] in (1, 2, 3, 4):
        h, w, channels = arr.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        if channels == 1:
            arr = arr.reshape(h, w)
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = arr.reshape(h, w * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, compress_level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def resize_nearest(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resize (the stdlib stand-in for LANCZOS; same
    output dimensions, different pixel values — documented divergence)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(new_h) * h / new_h).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(new_w) * w / new_w).astype(np.int64), w - 1)
    return arr[ys][:, xs]
