"""Stdlib GIF decoder (+ deterministic encoder for fixtures/tests).

Public spec: GIF89a (CompuServe, 1990; W3C hosts the text) — logical
screen descriptor, global/local color tables, graphic-control extension
(transparency), image descriptors with optional interlacing, and the
GIF flavor of LZW: LSB-first bit packing, variable code width starting
at ``min_code_size + 1`` growing to at most 12 bits, CLEAR/END control
codes, and deferred-clear behavior (a full table stops growing until
the next CLEAR).  This is the SECOND image format the multimodal tier
decodes with zero dependencies (functions/png.py is the first): the
reference reads images through PIL (services/file/file_utils.py), which
handles GIF natively — this closes that gap stdlib-only, and image
dedup/pixel-stat passes work on real GIF bytes.

Scope: still images — the FIRST image descriptor of an animated GIF is
decoded and later frames ignored (the thumbnail semantic a crawl
pipeline wants); both global and local color tables; interlaced rows
de-woven (passes 0/4/2/1 stride 8/8/4/2); GCE transparency expands to
RGBA.  The encoder is a REAL adaptive LZW compressor (not just the
"uncompressed GIF" trick) whose code-width schedule tracks the
decoder-visible dictionary size, so encoder/decoder width sync — the
classic GIF off-by-one — is pinned by property roundtrips.

LZW width sync, derived once and tested: after a CLEAR the decoder's
first free code is ``base = (1 << mcs) + 2``; reading the t-th code it
has added t-2 entries (the first code after CLEAR adds none), so the
width it uses for code t is ``max(mcs+1, bit_length(base + t - 2))``
capped at 12.  The ENCODER has added t-1 entries at the same moment —
one ahead — which is exactly the off-by-one that breaks naive encoders;
this encoder computes the decoder-visible width directly from t.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW (GIF flavor: LSB-first, variable width, CLEAR/END)
# ---------------------------------------------------------------------------


def lzw_decode_gif(data: bytes, mcs: int) -> bytes:
    """GIF LZW decode of the concatenated image sub-block bytes."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad GIF LZW min code size {mcs}")
    clear, end = 1 << mcs, (1 << mcs) + 1
    base_dict = {i: bytes([i]) for i in range(clear)}
    table = dict(base_dict)
    next_code = end + 1
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None

    acc = 0  # LSB-first bit accumulator
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # missing END: tolerate truncation
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = dict(base_dict)
            next_code = end + 1
            width = mcs + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("GIF LZW: first code not a literal")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        if prev is not None and next_code < (1 << _MAX_CODE_WIDTH):
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            # next_code == 4096: deferred clear — table frozen at 12 bits
        prev = entry


def lzw_encode_gif(data: bytes, mcs: int) -> bytes:
    """Adaptive GIF LZW encoder (fixture-side inverse of
    :func:`lzw_decode_gif`).  The emit width for the t-th code after a
    CLEAR is the DECODER's width at that moment (see module docstring);
    the table is cleared when the decoder-visible dictionary would pass
    the 12-bit cap, sidestepping deferred-clear asymmetry."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    base = end + 1

    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def dec_width(t: int) -> int:
        if t <= 1:
            return mcs + 1
        return min(
            _MAX_CODE_WIDTH, max(mcs + 1, (base + t - 2).bit_length())
        )

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = base
    t = 0  # codes emitted since the last CLEAR
    emit(clear, mcs + 1)
    buf = b""
    for i in range(len(data)):
        ch = data[i : i + 1]
        if buf + ch in table:
            buf += ch
            continue
        t += 1
        emit(table[buf], dec_width(t))
        if next_code >= (1 << _MAX_CODE_WIDTH):
            emit(clear, dec_width(t + 1))
            table = {bytes([j]): j for j in range(clear)}
            next_code = base
            t = 0
        else:
            table[buf + ch] = next_code
            next_code += 1
        buf = ch
    if buf:
        t += 1
        emit(table[buf], dec_width(t))
    emit(end, dec_width(t + 1))
    if nbits:
        bits.append(acc & 0xFF)
    return bytes(bits)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _deinterlace(rows: list[bytes], h: int) -> list[bytes]:
    out: list[bytes | None] = [None] * h
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out  # type: ignore[return-value]


def decode_gif(data: bytes):
    """GIF bytes -> numpy uint8 array (h, w, 3) or (h, w, 4 with GCE
    transparency).  First image descriptor only (animation thumbnails).
    Raises ValueError on anything that is not a decodable GIF."""
    import numpy as np

    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * size]
        if len(gct) < 3 * size:
            raise ValueError("GIF truncated in global color table")
        pos += 3 * size

    transparent = -1
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            raise ValueError("GIF has no image descriptor")
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                if data[pos + 1] & 0x01:
                    transparent = data[pos + 4]
            while True:  # skip sub-blocks
                ln = data[pos]
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if b == 0x2C:  # image descriptor
            w, h = struct.unpack("<HH", data[pos + 5 : pos + 9])
            ipack = data[pos + 9]
            pos += 10
            pal = gct
            if ipack & 0x80:
                size = 2 << (ipack & 0x07)
                pal = data[pos : pos + 3 * size]
                pos += 3 * size
            if pal is None:
                raise ValueError("GIF image has no color table")
            interlaced = bool(ipack & 0x40)
            mcs = data[pos]
            pos += 1
            chunks = []
            while True:
                ln = data[pos]
                pos += 1
                if ln == 0:
                    break
                chunks.append(data[pos : pos + ln])
                pos += ln
            idx = lzw_decode_gif(b"".join(chunks), mcs)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data short")
            idx = idx[: w * h]
            if interlaced:
                rows = [idx[y * w : (y + 1) * w] for y in range(h)]
                idx = b"".join(_deinterlace(rows, h))
            ind = np.frombuffer(idx, dtype=np.uint8)
            if ind.max(initial=0) * 3 + 2 >= len(pal):
                raise ValueError("GIF index outside color table")
            p = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
            rgb = p[ind].reshape(h, w, 3)
            if transparent >= 0:
                alpha = np.where(
                    ind.reshape(h, w) == transparent, 0, 255
                ).astype(np.uint8)
                return np.dstack([rgb, alpha])
            return rgb
        raise ValueError(f"GIF: unknown block 0x{b:02x}")
    raise ValueError("GIF truncated before trailer")


def encode_gif(
    indices,
    palette,
    transparent: int = -1,
    interlaced: bool = False,
) -> bytes:
    """Deterministic GIF89a writer for fixtures and roundtrip tests:
    ``indices`` (h, w) uint8 color-table indexes, ``palette`` (n, 3)
    uint8.  Emits a global color table, an optional transparency GCE,
    and one (optionally interlaced) image compressed with the adaptive
    encoder above."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = len(pal)
    bits = max(2, (max(n - 1, 1)).bit_length())  # GIF minimum mcs is 2
    size_field = bits - 1
    full = 1 << bits

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) << 4) | size_field)
    out += bytes([0, 0])  # bg index, aspect
    table = bytearray(pal.tobytes())
    table += bytes(3 * (full - n))
    out += table
    if transparent >= 0:
        out += bytes([0x21, 0xF9, 0x04, 0x01, 0, 0, transparent, 0x00])
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlaced else 0x00)
    rows = [idx[y].tobytes() for y in range(h)]
    if interlaced:
        woven = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            woven += [rows[y] for y in range(start, h, step)]
        rows = woven
    payload = lzw_encode_gif(b"".join(rows), bits)
    out.append(bits)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += bytes([0x00, 0x3B])
    return bytes(out)
