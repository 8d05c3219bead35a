"""Perceptual image dedup: average-hash (aHash) over REAL PNG pixels.

Engine extension for the interleaved text+media payload (SURVEY.md §2.12):
the reference stores screenshots/images as opaque base64 blobs
(services/crawler/crawler_service.py screenshot path, file_utils.py) and
has no image-level dedup; a 100-TB training-data pipeline needs one, so
this module supplies the standard perceptual-hash recipe as dataflow.

aHash (public recipe — pHash.org "average hash", the `imagehash` library):
grayscale -> resize to S x S -> bit_k = pixel_k > mean. Everything here is
pinned to EXACT integer arithmetic so a SQL oracle can reproduce it:

- grayscale = integer channel mean: sum(channels) // n_channels
- the mean compare avoids division entirely: bit_k = pixel_k * S*S > total
  (strictly greater, so constant images hash to all-zero bits)
- bit order is row-major, k = y*S + x; the packed 64-bit signature puts
  bit k at position k (bit 63 may set the sign of the Spark long — only
  xor/bit_count touch it, both sign-agnostic)

Spark shape, scale-first:

- ONE mapInPandas pass over (id, payload) decodes PNGs with the stdlib
  codec (functions/png.py) and emits (id, ahash:long, ahash_bits:string,
  width, height) — Arrow-batched, no per-row Python, payload column pruned
  away immediately after.
- near-dup pairs reuse the SimHash pigeonhole band join
  (operators/dedup.hamming_pairs): equi-join on bit slices, exact
  bit_count(xor) verify — never all-pairs, so it scales like the text
  LSH paths.
- dedup groups come from dedup.connected_components (hash-min label
  propagation) with the canonical representative = min id.

Non-PNG / undecodable payloads are dropped (a real pipeline routes them
to a quarantine sink; callers can anti-join to recover them).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eget_spark.functions.gif import GIF_MAGICS
from eget_spark.functions.media import decode_image
from eget_spark.functions.png import is_png, resize_nearest
from eget_spark.operators.dedup import connected_components, hamming_pairs

_AHASH_SCHEMA = (
    "media_ref string, ahash long, ahash_bits string, width int, height int"
)


def ahash_bytes(data: bytes, hash_size: int = 8) -> tuple[int, str]:
    """(packed signature, bitstring) of one PNG or GIF payload — the
    pinned integer-exact aHash recipe (module docstring). Driver-side
    twin of the distributed path; the distributed tests assert they
    agree. RGBA images (GIF transparency) average all 4 channels —
    deterministic, format-pinned."""
    arr = decode_image(data)
    if arr.ndim == 3:
        gray = arr.astype(np.int64).sum(axis=2) // arr.shape[2]
    else:
        gray = arr.astype(np.int64)
    if gray.shape != (hash_size, hash_size):
        gray = resize_nearest(gray, hash_size, hash_size)
    flat = gray.reshape(-1)
    total = int(flat.sum())
    n = hash_size * hash_size
    bits = (flat * n > total).astype(np.uint8)
    sig = 0
    for k in range(n - 1, -1, -1):
        sig = (sig << 1) | int(bits[k])
    if n == 64 and sig >= 1 << 63:  # two's-complement into a Spark long
        sig -= 1 << 64
    return sig, "".join("1" if b else "0" for b in bits)


def image_ahash(
    media: DataFrame,
    hash_size: int = 8,
    id_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_ref, ahash, ahash_bits, width, height) per decodable
    image (PNG or GIF, dispatched by magic).

    hash_size > 8 would overflow the 64-bit packed column; the bitstring
    column is the engine-portable form (and what oracles compare)."""
    assert hash_size * hash_size <= 64, "packed signature is 64-bit"
    src = media.select(
        F.col(id_col).alias("media_ref"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, sigs, bit_strs, ws, hs = [], [], [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                data = bytes(payload)
                if not (is_png(data) or data[:6] in GIF_MAGICS):
                    continue
                try:
                    arr = decode_image(data)
                except Exception:
                    continue
                h, w = arr.shape[:2]
                sig, bit_str = ahash_bytes(data, hash_size)
                refs.append(ref)
                sigs.append(sig)
                bit_strs.append(bit_str)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype=object),
                    "ahash": pd.Series(sigs, dtype="int64"),
                    "ahash_bits": pd.Series(bit_strs, dtype=object),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return src.mapInPandas(run, _AHASH_SCHEMA)


def near_dup_image_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    hash_size: int = 8,
    id_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """(id_a, id_b, hamming) pairs of perceptually near-duplicate images.

    The decode pass is checkpointed once (it feeds both sides of the band
    self-join); the join itself is the pigeonhole blocking shared with
    text SimHash — candidate generation is equi-join-only."""
    sigs = image_ahash(
        media, hash_size=hash_size, id_col=id_col, payload_col=payload_col
    ).localCheckpoint(eager=True)
    return hamming_pairs(
        sigs,
        "ahash",
        hash_size * hash_size,
        max_hamming=max_hamming,
        bands=bands,
        id_col="media_ref",
    )


def dedup_images(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    hash_size: int = 8,
    id_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_ref, canonical) for every decodable image: canonical = min
    media_ref of its near-dup connected component (singletons map to
    themselves). Drop rows where media_ref != canonical to dedup."""
    sigs = image_ahash(
        media, hash_size=hash_size, id_col=id_col, payload_col=payload_col
    ).localCheckpoint(eager=True)
    pairs = hamming_pairs(
        sigs,
        "ahash",
        hash_size * hash_size,
        max_hamming=max_hamming,
        bands=bands,
        id_col="media_ref",
    )
    comp = connected_components(pairs)
    return (
        sigs.select("media_ref")
        .join(comp.withColumnRenamed("id", "media_ref"), "media_ref", "left")
        .select(
            "media_ref",
            F.coalesce(F.col("component"), F.col("media_ref")).alias("canonical"),
        )
    )
