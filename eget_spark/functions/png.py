"""Minimal stdlib PNG codec (X19 support, SURVEY.md §2.8).

PNG is zlib-compressed filtered scanlines in CRC'd chunks, so a real
byte-level codec needs only ``zlib`` + ``struct`` + numpy: this module
decodes gray/RGB/RGBA at depth 8, palette (PLTE, color type 3) and
grayscale at depths 1/2/4/8 with tRNS palette alpha (all five scanline
filters — web icons/logos/screenshots are overwhelmingly palette PNGs),
and encodes filter-0 truecolor + palette PNGs, which upgrades the X19
image re-encode path
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
# color type -> samples per pixel (3 = palette indices, 1 sample/pixel)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


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
    grayscale).  Supports color types 0/2/3/4/6 (palette via PLTE, with
    tRNS palette alpha -> RGBA), bit depths 1/2/4/8 for gray and palette
    and 8 for the multi-channel types, no interlace."""
    if not is_png(data):
        raise ValueError("not a PNG")
    width = height = None
    channels = depth = color = None
    palette = trns = None
    idat = bytearray()
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if depth != 8 and not (color in (0, 3) and depth in (1, 2, 4)):
                raise ValueError(f"unsupported bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(payload, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += payload
    if width is None:
        raise ValueError("missing IHDR")
    if color == 3 and palette is None:
        raise ValueError("palette image missing PLTE")
    raw = zlib.decompress(bytes(idat))
    stride = (width * channels * depth + 7) // 8
    if len(raw) != height * (stride + 1):
        raise ValueError("bad scanline data length")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = arr[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    # filtering operates on BYTES regardless of depth; bpp rounds up to 1
    # for sub-byte pixels (PNG spec 4.5.2)
    bpp = max(1, channels * depth // 8)
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
    if depth < 8:
        # MSB-first sub-byte samples (gray levels or palette indices);
        # trailing pad bits of each scanline are discarded
        bits = np.unpackbits(out, axis=1)[:, : width * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        samples = (
            bits.reshape(height, width, depth).astype(np.uint8) * weights
        ).sum(axis=2).astype(np.uint8)
    else:
        samples = out
    if color == 3:
        idx = samples.reshape(height, width)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if color == 0 and depth < 8:
        # scale to full 8-bit range: 255/(2^d-1) is integral for d=1,2,4
        return (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if channels == 1:
        return samples.reshape(height, width)
    return samples.reshape(height, width, channels)


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


def encode_palette_png(
    indices: np.ndarray,
    palette: np.ndarray,
    depth: int = 8,
    trns: bytes | None = None,
    compress_level: int = 6,
) -> bytes:
    """(h, w) palette-index array + (n, 3) palette -> color-type-3 PNG at
    bit depth 1/2/4/8 (MSB-first packing, filter-0 scanlines, optional
    tRNS palette alpha).  The encoder half of the palette support —
    mainly for tests/fixtures; production re-encode stays truecolor."""
    if depth not in (1, 2, 4, 8):
        raise ValueError("palette depth must be 1/2/4/8")
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("indices must be (h, w)")
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("palette must be (n<=256, 3)")
    if int(idx.max(initial=0)) >= (1 << depth) or int(idx.max(initial=0)) >= len(pal):
        raise ValueError("index exceeds depth or palette size")
    h, w = idx.shape
    if depth == 8:
        rows = [idx[y].tobytes() for y in range(h)]
    else:
        rows = []
        for y in range(h):
            bits = (
                (idx[y][:, None] >> np.arange(depth - 1, -1, -1)) & 1
            ).astype(np.uint8).reshape(-1)
            rows.append(np.packbits(bits).tobytes())
    raw = b"".join(b"\x00" + r for r in rows)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(raw, compress_level)) + _chunk(b"IEND", b"")
