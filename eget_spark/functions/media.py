"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as `binary` payloads referenced by `media_ref`
strings from spans (SURVEY.md §1.1 X19; the reference base64-encodes
screenshots/images — scraper.py:913, file_utils.py:38-75). The Spark-side
plumbing here is real and tested — schemas, mapInPandas batch shapes,
deterministic partitioning — while the pixel/sample decode is stubbed:
PIL/ffmpeg are not in this container, so decoding is import-gated and the
default codec is a DETERMINISTIC FAKE (documented below) that preserves
every dataflow property (schema, sizes, determinism) without real codecs.

Fake codec format (synthesized by `synth_media`): payload =
  b"FAKE" + kind(1B: I/A/V) + width(4B LE) + height(4B LE) + n_frames(4B LE)
  + blake2b(seed) content bytes
Decode parses the header; "features" are 16 float32s derived from a
blake2b XOF of the payload — stable across runs and machines.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

_MAGIC = b"FAKE"
_KIND_CODE = {"image": b"I", "audio": b"A", "video": b"V"}
_CODE_KIND = {v: k for k, v in _KIND_CODE.items()}


def encode_fake(kind: str, width: int, height: int, n_frames: int, seed: str) -> bytes:
    body = hashlib.blake2b(seed.encode(), digest_size=64).digest()
    return (
        _MAGIC
        + _KIND_CODE[kind]
        + struct.pack("<III", width, height, n_frames)
        + body
    )


def decode_fake(payload: bytes) -> dict:
    if payload[:4] != _MAGIC:
        raise ValueError("not a FAKE media payload")
    kind = _CODE_KIND[payload[4:5]]
    width, height, n_frames = struct.unpack("<III", payload[5:17])
    return {
        "kind": kind,
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "bytes": len(payload),
    }


def synth_media(spark: SparkSession, n: int = 256, n_partitions: int = 8) -> DataFrame:
    """Deterministic fake media table keyed media_ref = img://{sha8}
    (matches the corpus `image` spans' ref format)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                w, h, fr = 64 + (i % 8) * 32, 64 + (i % 5) * 32, 1 + (i % 30)
                payload = encode_fake(kind, w, h, fr, f"media:{i}")
                ref = f"img://{hashlib.blake2b(str(i).encode(), digest_size=4).hexdigest()}"
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "n_frames": fr,
                            "bytes": len(payload),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(n_partitions).mapInPandas(gen, MEDIA_SCHEMA)


DECODED_DDL = (
    "media_ref string, kind string, width int, height int, n_frames int, bytes long"
)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode step as mapInPandas over Arrow batches of binary payloads.

    With PIL present this is where `Image.open(BytesIO(payload))` would
    run (import-gated); the fake codec keeps the batch shape identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401  (real path, absent here)
        except ImportError:
            Image = None
        from .png import is_png, png_size

        for pdf in batches:
            out = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload)
                if is_png(b):
                    # real image payload: header-only sizing (stdlib), no
                    # full pixel decode in the metadata pass
                    w, h = png_size(b)
                    d = {
                        "kind": "image",
                        "width": w,
                        "height": h,
                        "n_frames": 1,
                        "bytes": len(b),
                    }
                else:
                    d = decode_fake(b)
                d["media_ref"] = ref
                out.append(d)
            if out:
                yield pd.DataFrame(out)

    return media.select("media_ref", "payload").mapInPandas(run, DECODED_DDL)


def encode_image_data_uri(
    image_data: bytes, format: str = "PNG", max_size_kb: int = 500
) -> str | None:
    """X19 real path (file_utils.py:38-75, exact rules): PIL open; if the
    SOURCE byte size exceeds max_size_kb, resize by scale=sqrt(max/cur)
    with LANCZOS; JPEG flattens RGBA/LA onto white at quality=85; emit a
    data:image/..;base64 URI; any failure -> None (the reference swallows
    and logs).

    Without PIL, PNG payloads run through the stdlib codec
    (functions/png.py): same sqrt resize rule and data-URI framing,
    nearest-neighbor in place of LANCZOS (dimension-exact, pixel-values
    divergence documented there).  JPEG output without PIL stays
    NotImplementedError — no stdlib JPEG encoder exists."""
    try:
        from PIL import Image
    except ImportError as e:
        from .png import decode_png, encode_png, is_png, resize_nearest

        if format.upper() != "PNG":
            raise NotImplementedError(
                f"{format} re-encode requires PIL (not in this environment); "
                "PNG re-encode runs via the stdlib codec, and resize_images "
                "covers the metadata-side rule"
            ) from e
        import base64

        try:
            if not is_png(image_data):
                return None
            arr = decode_png(image_data)
            current_size = len(image_data) / 1024
            if current_size > max_size_kb:
                scale = (max_size_kb / current_size) ** 0.5
                h, w = arr.shape[:2]
                arr = resize_nearest(arr, max(1, int(w * scale)), max(1, int(h * scale)))
            encoded = base64.b64encode(encode_png(arr)).decode("utf-8")
            return f"data:image/png;base64,{encoded}"
        except Exception:
            return None
    import base64
    import io

    try:
        img = Image.open(io.BytesIO(image_data))
        current_size = len(image_data) / 1024
        if current_size > max_size_kb:
            scale = (max_size_kb / current_size) ** 0.5
            img = img.resize(
                (int(img.width * scale), int(img.height * scale)),
                Image.Resampling.LANCZOS,
            )
        out = io.BytesIO()
        if format.upper() == "JPEG":
            if img.mode in ("RGBA", "LA"):
                background = Image.new("RGB", img.size, (255, 255, 255))
                background.paste(img, mask=img.split()[-1])
                img = background
            img.save(out, format=format, quality=85, optimize=True)
        else:
            img.save(out, format=format, optimize=True)
        encoded = base64.b64encode(out.getvalue()).decode("utf-8")
        return f"data:image/{format.lower()};base64,{encoded}"
    except Exception:
        return None


REENCODED_DDL = "media_ref string, data_uri string"


def reencode_images(
    media: DataFrame, format: str = "PNG", max_size_kb: int = 500
) -> DataFrame:
    """X19 over the media table: mapInPandas batches of image payloads ->
    data URIs (PIL-gated; the batch plumbing is environment-independent)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "data_uri": [
                        encode_image_data_uri(bytes(p), format, max_size_kb)
                        for p in pdf["payload"]
                    ],
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_ref", "payload")
        .mapInPandas(run, REENCODED_DDL)
    )


FEATURES_DDL = "media_ref string, features array<float>"


def media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction (embedding) per payload — deterministic blake2b
    XOF floats standing in for a vision/audio encoder; batch-vectorized."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, feats = [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                h = hashlib.blake2b(bytes(payload), digest_size=dim * 4).digest()
                arr = np.frombuffer(h, dtype=np.uint32).astype(np.float32)
                feats.append((arr / np.float32(2**32)).tolist())
                refs.append(ref)
            if refs:
                yield pd.DataFrame({"media_ref": refs, "features": feats})

    return media.select("media_ref", "payload").mapInPandas(run, FEATURES_DDL)


def resize_images(media: DataFrame, max_side: int = 128) -> DataFrame:
    """X19 resize rule (file_utils.py:38-75: scale = sqrt(max/cur) when
    oversized) applied to metadata; the pixel op itself is the gated step."""
    scale = F.sqrt(
        F.lit(float(max_side))
        / F.greatest(F.col("meta.width"), F.col("meta.height"))
    )
    need = F.greatest(F.col("meta.width"), F.col("meta.height")) > max_side
    return media.select(
        "media_ref",
        "kind",
        F.when(need, (F.col("meta.width") * scale).cast("int"))
        .otherwise(F.col("meta.width"))
        .alias("width"),
        F.when(need, (F.col("meta.height") * scale).cast("int"))
        .otherwise(F.col("meta.height"))
        .alias("height"),
    )


FRAMES_DDL = "media_ref string, frame_idx int, frame_ref string"


def sample_frames(media: DataFrame, every: int = 10) -> DataFrame:
    """Video frame sampling: emit one row per sampled frame index — pure
    column expressions (sequence + explode), the decode of each frame being
    the gated step. Deterministic frame_ref for downstream joins."""
    v = media.where(F.col("kind") == "video")
    idx = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every)
    )
    return v.select(
        "media_ref",
        F.explode(idx).alias("frame_idx"),
        F.concat_ws("#", "media_ref", F.col("frame_idx").cast("string")).alias(
            "frame_ref"
        ),
    )


def decode_image(payload: bytes):
    """Magic-byte image dispatch over the stdlib codecs: PNG
    (functions/png.py) and GIF87a/89a (functions/gif.py) -> numpy uint8
    (h, w[, ch]).  Raises ValueError for anything else — callers
    quarantine undecodables."""
    from .gif import GIF_MAGICS, decode_gif
    from .png import decode_png

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:6] in GIF_MAGICS:
        return decode_gif(payload)
    raise ValueError("unknown image format")


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """Full-pixel decode stats per image: (media_ref, width, height,
    channels, pix_total) with pix_total = int64 sum of every channel
    byte — the cheap whole-image signal the dedup/quality tiers key on
    (and the oracle surface for the palette/sub-byte decode paths).
    One Arrow pass over (media_ref, payload), zero shuffle; undecodable
    payloads dropped (quarantine by anti-join)."""
    import numpy as np

    schema = (
        "media_ref string, width int, height int, channels int, "
        "pix_total long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    arr = decode_image(bytes(payload))
                except Exception:
                    continue
                h, w = arr.shape[0], arr.shape[1]
                ch = 1 if arr.ndim == 2 else arr.shape[2]
                rows.append((ref, w, h, ch, int(arr.astype(np.int64).sum())))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "width", "height", "channels", "pix_total"],
            )

    return media.select("media_ref", "payload").mapInPandas(run, schema)


def image_pixel_checksums(media: DataFrame) -> DataFrame:
    """image_pixel_stats plus a POSITION-WEIGHTED checksum:
    ``pos_weighted`` = sum over pixels of (y*w + x) * channel0(y, x) as
    int64.  The plain byte sum is permutation-invariant, so it cannot
    see row-order bugs (a wrong GIF de-interlace weave produces the same
    pix_total); the position weighting pins the exact pixel layout.
    Same one-Arrow-pass, zero-shuffle shape as image_pixel_stats."""
    import numpy as np

    schema = (
        "media_ref string, width int, height int, channels int, "
        "pix_total long, pos_weighted long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    arr = decode_image(bytes(payload))
                except Exception:
                    continue
                h, w = arr.shape[0], arr.shape[1]
                ch = 1 if arr.ndim == 2 else arr.shape[2]
                c0 = (arr if arr.ndim == 2 else arr[:, :, 0]).astype(np.int64)
                pw = int((np.arange(h * w, dtype=np.int64) * c0.ravel()).sum())
                rows.append(
                    (ref, w, h, ch, int(arr.astype(np.int64).sum()), pw)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref",
                    "width",
                    "height",
                    "channels",
                    "pix_total",
                    "pos_weighted",
                ],
            )

    return media.select("media_ref", "payload").mapInPandas(run, schema)


def image_header_dims(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from CONTAINER HEADERS ONLY — no pixel
    decode, no decompression: PNG reads the IHDR fields (spec 11.2.2,
    big-endian at bytes 16..23), GIF the logical screen descriptor
    (GIF89a spec §18, little-endian at bytes 6..9), JPEG walks the
    marker stream to the first SOF frame header (ITU T.81 §B.2.2 —
    any SOF0..SOF15 except the DHT/DAC/RST aliases C4/C8/CC) and reads
    its big-endian height/width, BMP the DIB header (both the 12-byte
    OS/2 BITMAPCOREHEADER with uint16 dims and the >=40-byte
    BITMAPINFOHEADER family with int32 dims, where a NEGATIVE height
    means top-down row order — dimension is its magnitude), and WebP
    the first RIFF chunk (container spec: lossy ``VP8 `` keyframe
    14-bit dims after the 9d 01 2a sync code, lossless ``VP8L``
    14-bit-packed width-1/height-1 after the 0x2F signature, extended
    ``VP8X`` 24-bit little-endian canvas width-1/height-1), TIFF the
    first IFD's ImageWidth/ImageLength tags (TIFF 6.0 §2, both II and
    MM byte orders, SHORT or LONG inline values), and ICO the first
    ICONDIRENTRY's width/height bytes (0 encodes 256).  Returns
    None for anything else (or a truncated/invalid stream) — the
    quarantine contract shared with decode_image."""
    import struct

    from .gif import GIF_MAGICS

    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("png", w, h)
        if payload[:6] in GIF_MAGICS:
            w, h = struct.unpack("<HH", payload[6:10])
            return ("gif", w, h)
        if payload[:2] == b"BM" and len(payload) >= 26:
            dib = struct.unpack("<I", payload[14:18])[0]
            if dib == 12:  # BITMAPCOREHEADER (OS/2 1.x): uint16 dims
                w, h = struct.unpack("<HH", payload[18:22])
                return ("bmp", w, h)
            if dib >= 40:  # BITMAPINFOHEADER and later: int32 dims
                w, h = struct.unpack("<ii", payload[18:26])
                if w <= 0 or h == 0:
                    return None
                return ("bmp", w, abs(h))
            return None
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            four = payload[12:16]
            if four == b"VP8 " and payload[23:26] == b"\x9d\x01\x2a":
                w, h = struct.unpack("<HH", payload[26:30])
                return ("webp", w & 0x3FFF, h & 0x3FFF)
            if four == b"VP8L" and payload[20:21] == b"\x2f":
                bits = struct.unpack("<I", payload[21:25])[0]
                return ("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
            if four == b"VP8X" and len(payload) >= 30:
                w = int.from_bytes(payload[24:27], "little") + 1
                h = int.from_bytes(payload[27:30], "little") + 1
                return ("webp", w, h)
            return None
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            # TIFF 6.0 §2: byte-order mark, magic 42, offset to IFD0.
            # Dims are IFD tags 256 (ImageWidth) / 257 (ImageLength) of
            # type SHORT(3) or LONG(4); inline values are LEFT-JUSTIFIED
            # in the 4-byte value field, so the SHORT sits in its first
            # two bytes under either endianness.  First IFD only.
            bo = "<" if payload[:2] == b"II" else ">"
            off = struct.unpack(bo + "I", payload[4:8])[0]
            if off + 2 > len(payload):
                return None
            cnt = struct.unpack(bo + "H", payload[off : off + 2])[0]
            w = h = None
            for k in range(cnt):
                e = off + 2 + 12 * k
                if e + 12 > len(payload):
                    return None
                tag, typ = struct.unpack(bo + "HH", payload[e : e + 4])
                if tag in (256, 257):
                    if typ == 3:
                        val = struct.unpack(bo + "H", payload[e + 8 : e + 10])[0]
                    elif typ == 4:
                        val = struct.unpack(bo + "I", payload[e + 8 : e + 12])[0]
                    else:
                        return None
                    if tag == 256:
                        w = val
                    else:
                        h = val
            if w and h:
                return ("tiff", w, h)
            return None
        if payload[:4] == b"\x00\x00\x01\x00" and len(payload) >= 8:
            # ICO (ICONDIR type 1): first ICONDIRENTRY width/height
            # bytes at 6..7, where 0 encodes 256 (the format's own rule)
            cnt = struct.unpack("<H", payload[4:6])[0]
            if cnt < 1:
                return None
            return ("ico", payload[6] or 256, payload[7] or 256)
        if payload[:2] == b"\xff\xd8":
            i = 2
            n = len(payload)
            while i + 9 <= n:
                if payload[i] != 0xFF:
                    return None  # marker desync
                marker = payload[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return ("jpeg", w, h)
                if marker == 0xDA:  # start of scan: no SOF seen -> invalid
                    return None
                i += 2 + seg_len
            return None
    except (struct.error, IndexError):
        return None
    return None


def image_dimensions(media: DataFrame) -> DataFrame:
    """Header-only image dimension census: (media_ref, format, width,
    height) for PNG/GIF/JPEG via :func:`image_header_dims` — the
    training-pipeline pre-filter (drop icons/trackers below a size
    floor, route oversized panoramas to tiling) that must NOT pay a
    pixel decode: at 100 TB the headers are a few dozen bytes per image
    while a decode touches every pixel.  Notably this covers JPEG,
    which the stdlib PIXEL path cannot decode (media.py:167) — the
    dimensions live in the uncompressed marker stream, so the census
    stays complete across all three formats.  One Arrow mapInPandas
    pass, zero shuffle; undecodable payloads dropped (quarantine by
    anti-join, the image_pixel_stats contract)."""
    schema = "media_ref string, format string, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if payload is None:
                    continue
                got = image_header_dims(bytes(payload))
                if got is not None:
                    rows.append((ref, got[0], got[1], got[2]))
            yield pd.DataFrame(
                rows, columns=["media_ref", "format", "width", "height"]
            )

    return media.select("media_ref", "payload").mapInPandas(run, schema)
