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
        # PNG runs via the stdlib codec now: malformed bytes -> None (the
        # reference swallows failures); JPEG output stays PIL-gated
        assert encode_image_data_uri(b"\x89PNG....", "PNG") is None
        with pytest.raises(NotImplementedError):
            encode_image_data_uri(b"\xff\xd8\xff....", "JPEG")
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


def test_png_codec_roundtrip_all_shapes():
    """Stdlib PNG codec: encode->decode is identity for gray/RGB/RGBA."""
    import numpy as np

    from eget_spark.functions.png import decode_png, encode_png, png_size

    rng = np.random.default_rng(7)
    for shape in [(13, 17), (8, 9, 3), (5, 6, 4)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        data = encode_png(arr)
        assert png_size(data) == (shape[1], shape[0])
        back = decode_png(data)
        assert back.shape == arr.shape and (back == arr).all()


def test_png_decode_all_filter_types():
    """Decoder must reconstruct Sub/Up/Average/Paeth filtered scanlines —
    a hand-built PNG applies a different filter per row."""
    import struct
    import zlib

    import numpy as np

    from eget_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    # build scanlines with filters [0,1,2,3,4] row by row (encoder side of
    # the filters, so decode must invert each)
    h, w, ch = arr.shape
    bpp = ch
    flat = arr.reshape(h, w * ch).astype(np.int32)
    lines = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros_like(cur)
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) & 0xFF
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
    base = encode_png(arr)  # reuse header/trailer framing

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        base[:8]
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(data) == arr).all()


def test_reencode_images_stdlib_png(spark):
    """X19 end-to-end without PIL: oversized PNG payloads are resized by
    the sqrt rule and re-emitted as data:image/png URIs; small ones pass
    through at original dimensions."""
    import base64

    import numpy as np

    from eget_spark.functions.media import reencode_images
    from eget_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(11)
    big = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)  # ~190KB png
    small = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        ("m1", "image", bytearray(encode_png(big)), (256, 256, 1, 0)),
        ("m2", "image", bytearray(encode_png(small)), (16, 16, 1, 0)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_ref string, kind string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,bytes:long>",
    )
    out = {
        r["media_ref"]: r["data_uri"]
        for r in reencode_images(media, format="PNG", max_size_kb=50).collect()
    }
    assert out["m2"] is not None and out["m2"].startswith("data:image/png;base64,")
    small_back = decode_png(base64.b64decode(out["m2"].split(",", 1)[1]))
    assert (small_back == small).all()  # under the size cap: no resize
    big_raw = len(encode_png(big)) / 1024
    scale = (50 / big_raw) ** 0.5
    big_back = decode_png(base64.b64decode(out["m1"].split(",", 1)[1]))
    assert big_back.shape[:2] == (int(256 * scale), int(256 * scale))


def test_decode_media_real_png_header(spark):
    """decode_media sizes real PNG payloads from IHDR (no pixel decode),
    alongside fake-codec payloads in the same batch."""
    import numpy as np

    from eget_spark.functions.media import decode_media, encode_fake
    from eget_spark.functions.png import encode_png

    png = encode_png(np.zeros((12, 34, 3), dtype=np.uint8))
    rows = [
        ("p1", "image", bytearray(png), (0, 0, 0, 0)),
        ("f1", "video", bytearray(encode_fake("video", 64, 48, 30, "s")), (0, 0, 0, 0)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_ref string, kind string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,bytes:long>",
    )
    got = {r["media_ref"]: r for r in decode_media(media).collect()}
    assert (got["p1"]["width"], got["p1"]["height"]) == (34, 12)
    assert got["p1"]["kind"] == "image" and got["p1"]["bytes"] == len(png)
    assert (got["f1"]["width"], got["f1"]["n_frames"]) == (64, 30)


def _jpeg_header_bytes(w: int, h: int) -> bytes:
    """Minimal structurally-valid JPEG marker stream: SOI, APP0 (JFIF),
    a DHT segment (must be SKIPPED — 0xC4 is in the C0..CF range but is
    not a frame header), a standalone RST marker (no length field), the
    SOF0 frame header carrying the dimensions, EOI."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    dht = b"\xff\xc4" + struct.pack(">H", 5) + bytes(3)
    rst = b"\xff\xd0"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03"
        + bytes(9)
    )
    return b"\xff\xd8" + app0 + dht + rst + sof0 + b"\xff\xd9"


def test_image_header_dims_match_pixel_decode(spark):
    """PNG and GIF header dims must equal the full pixel decode's shape
    — same bytes, two independent paths."""
    import numpy as np

    from eget_spark.functions.gif import encode_gif
    from eget_spark.functions.media import decode_image, image_header_dims
    from eget_spark.functions.png import encode_png

    rgb = np.arange(7 * 5 * 3, dtype=np.uint8).reshape(5, 7, 3)
    png = encode_png(rgb)
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    gif = encode_gif((np.arange(24, dtype=np.uint8) % 2).reshape(4, 6), pal)
    for payload, fmt in ((png, "png"), (gif, "gif")):
        got = image_header_dims(payload)
        arr = decode_image(payload)
        assert got == (fmt, arr.shape[1], arr.shape[0])


def test_image_header_dims_jpeg_marker_walk():
    from eget_spark.functions.media import image_header_dims

    assert image_header_dims(_jpeg_header_bytes(640, 480)) == (
        "jpeg", 640, 480,
    )
    # large dims exercise the big-endian unpack
    assert image_header_dims(_jpeg_header_bytes(30000, 2)) == (
        "jpeg", 30000, 2,
    )


def test_image_header_dims_rejects_garbage():
    from eget_spark.functions.media import image_header_dims

    assert image_header_dims(b"") is None
    assert image_header_dims(b"\xff\xd8\x00\x00") is None  # marker desync
    assert image_header_dims(b"\xff\xd8\xff\xda\x00\x04\x00\x00") is None
    assert image_header_dims(b"not an image at all") is None
    assert image_header_dims(b"\x89PNG\r\n\x1a\nXXXXIHDX") is None


def test_image_dimensions_census(spark):
    """The distributed census: mixed PNG/GIF/JPEG/garbage payloads ->
    one row per decodable image, garbage quarantined (dropped)."""
    import numpy as np

    from eget_spark.functions.gif import encode_gif
    from eget_spark.functions.media import image_dimensions
    from eget_spark.functions.png import encode_png

    pal = np.array([[9, 8, 7], [6, 5, 4]], dtype=np.uint8)
    rows = [
        ("png1", bytearray(encode_png(np.zeros((3, 9, 3), dtype=np.uint8)))),
        ("gif1", bytearray(encode_gif(np.zeros((2, 5), dtype=np.uint8), pal))),
        ("jpg1", bytearray(_jpeg_header_bytes(123, 45))),
        ("bad1", bytearray(b"garbage bytes")),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {
        r["media_ref"]: (r["format"], r["width"], r["height"])
        for r in image_dimensions(df).collect()
    }
    assert got == {
        "png1": ("png", 9, 3),
        "gif1": ("gif", 5, 2),
        "jpg1": ("jpeg", 123, 45),
    }


def test_image_header_dims_bmp_variants():
    import struct

    from eget_spark.functions.media import image_header_dims

    def bmp_info(w, h):
        hdr = b"BM" + struct.pack("<IHHI", 58, 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, 4, 2835, 2835, 0, 0
        )
        return hdr + dib + b"\x00\x00\xff\x00"

    assert image_header_dims(bmp_info(5, 3)) == ("bmp", 5, 3)
    # negative height = top-down row order; dimension is the magnitude
    assert image_header_dims(bmp_info(7, -4)) == ("bmp", 7, 4)
    # OS/2 BITMAPCOREHEADER: 12-byte DIB, uint16 dims
    core = (
        b"BM" + struct.pack("<IHHI", 30, 0, 0, 26)
        + struct.pack("<IHHHH", 12, 6, 2, 1, 24) + b"\x12\x34"
    )
    assert image_header_dims(core) == ("bmp", 6, 2)
    assert image_header_dims(b"BMshort") is None
    assert image_header_dims(bmp_info(0, 3)) is None  # degenerate width


def test_image_header_dims_webp_variants():
    import struct

    from eget_spark.functions.media import image_header_dims

    def webp(fourcc, body):
        chunk = fourcc + struct.pack("<I", len(body)) + body
        if len(body) % 2:
            chunk += b"\x00"
        return (
            b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        )

    lossy = webp(
        b"VP8 ",
        b"\x30\x00\x00\x9d\x01\x2a" + struct.pack("<HH", 9, 7) + b"\x00" * 6,
    )
    assert image_header_dims(lossy) == ("webp", 9, 7)
    # 14-bit dims: the top 2 bits of each uint16 are scale hints, masked
    lossy_scaled = webp(
        b"VP8 ",
        b"\x30\x00\x00\x9d\x01\x2a"
        + struct.pack("<HH", 9 | 0x4000, 7 | 0x8000) + b"\x00" * 6,
    )
    assert image_header_dims(lossy_scaled) == ("webp", 9, 7)
    bits = (11 - 1) | ((6 - 1) << 14)
    lossless = webp(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00")
    assert image_header_dims(lossless) == ("webp", 11, 6)
    ext = webp(
        b"VP8X",
        b"\x00\x00\x00\x00"
        + (12 - 1).to_bytes(3, "little") + (8 - 1).to_bytes(3, "little"),
    )
    assert image_header_dims(ext) == ("webp", 12, 8)
    # bad sync code / bad signature byte -> quarantined
    bad = webp(b"VP8 ", b"\x30\x00\x00\x9d\x01\x2b" + b"\x00" * 10)
    assert image_header_dims(bad) is None
    assert image_header_dims(b"RIFF\x04\x00\x00\x00WAVE") is None


def _tiff(w, h, bo="<", typ=3, extra_tag=True):
    import struct

    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    entries = []

    def entry(tag, t, val):
        if t == 3:
            vf = struct.pack(bo + "H", val) + b"\x00\x00"
        else:
            vf = struct.pack(bo + "I", val)
        return struct.pack(bo + "HHI", tag, t, 1) + vf

    if extra_tag:
        entries.append(entry(259, 3, 1))  # Compression=none, ignored
    entries.append(entry(256, typ, w))
    entries.append(entry(257, typ, h))
    ifd = struct.pack(bo + "H", len(entries)) + b"".join(entries) + b"\x00" * 4
    return magic + struct.pack(bo + "I", 8) + ifd


def test_image_header_dims_tiff_variants():
    from eget_spark.functions.media import image_header_dims

    assert image_header_dims(_tiff(9, 7, "<", 3)) == ("tiff", 9, 7)
    assert image_header_dims(_tiff(9, 7, ">", 3)) == ("tiff", 9, 7)
    assert image_header_dims(_tiff(70000, 5, "<", 4)) == ("tiff", 70000, 5)
    assert image_header_dims(_tiff(70000, 5, ">", 4)) == ("tiff", 70000, 5)
    # missing height tag -> quarantined
    bad = _tiff(9, 7, "<", 3)
    import struct

    # rebuild with only width: count=1 entry (tag 256)
    only_w = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
              + struct.pack("<HHI", 256, 3, 1) + struct.pack("<H", 9)
              + b"\x00\x00" + b"\x00" * 4)
    assert image_header_dims(only_w) is None
    # RATIONAL-typed dim -> unsupported, quarantined
    rat = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
           + struct.pack("<HHI", 256, 5, 1) + struct.pack("<I", 64))
    assert image_header_dims(rat) is None
    # truncated IFD -> quarantined
    assert image_header_dims(bad[:12]) is None


def test_image_header_dims_ico():
    import struct

    from eget_spark.functions.media import image_header_dims

    def ico(w, h, count=1, typ=1):
        entry = bytes([w % 256, h % 256, 0, 0]) + struct.pack(
            "<HHII", 1, 32, 64, 22
        )
        return struct.pack("<HHH", 0, typ, count) + entry

    assert image_header_dims(ico(48, 32)) == ("ico", 48, 32)
    # 0 encodes 256 (the format's own rule)
    assert image_header_dims(ico(256, 256)) == ("ico", 256, 256)
    # CUR (type 2) is not an icon: magic differs -> quarantined
    assert image_header_dims(ico(16, 16, typ=2)) is None
    # zero entries -> quarantined
    assert image_header_dims(struct.pack("<HHH", 0, 1, 0) + b"\x00" * 2) is None
