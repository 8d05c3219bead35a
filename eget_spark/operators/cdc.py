"""Content-defined chunking (CDC) storage dedup — the chunk-level
archive-compression layer below WARC revisit records.

Revisit dedup (sources/warc.revisit_dedup) only saves bytes when a
recrawl is BYTE-IDENTICAL; real pages churn a timestamp or a nav block
and re-store everything.  Content-defined chunking (the LBFS rolling-
hash technique, Muthitacharoen et al. SOSP'01; FastCDC, Xia et al. ATC'16
is the modern tuned variant) cuts every payload at positions chosen by a
rolling hash of the CONTENT, so an insertion early in a page shifts
boundaries only locally and every untouched chunk re-hashes identically —
cross-page and cross-crawl dedup falls out of a groupBy(chunk_hash).

Pinned semantics (engine-exact; the SQL oracle recomputes boundaries
byte-by-byte with window lags):

- bytes are the UTF-8 code units of the text (the engine synthesizes
  ASCII; callers with non-ASCII payloads chunk ``binary`` columns the
  same way);
- rolling hash at 1-indexed byte position i >= W:
  ``h_i = (sum_{j=0..W-1} b_{i-j} * P^j) mod M`` with W=8, P=31,
  M=2^20 — pure int64 (max term sum ~7e12), no overflow ambiguity;
- position i is a CUT iff ``i >= W`` and ``h_i mod 2^mask_bits == 0``
  (mask_bits=6 -> expected 64-byte chunks); the cut byte is the LAST
  byte of its chunk; the document tail is always a final chunk;
- chunk identity = md5 of the chunk's substring; chunk length in bytes.

No min/max chunk clamps (LBFS uses them to bound variance; they make
the boundary decision STATEFUL — dependent on the previous cut — which
destroys the shift-resistance property this operator exists for and
cannot be expressed as per-position predicates.  Pinned out, documented).

Scale shape: boundary detection + chunk hashing run in ONE Arrow
``mapInPandas`` pass — numpy vectorized rolling hash (a convolution),
per-chunk md5 only (chunk count ~ bytes/64, not bytes) — no shuffle; the
dedup statistics are ONE map-side-combined groupBy(chunk_hash) over the
emitted chunk rows.  At 100 TB the chunk table is ~1.6% of corpus rows
x a 32-byte key — the same order as the URL-seen filter state.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CDC_WINDOW = 8
CDC_PRIME = 31
CDC_MOD = 1 << 20
CDC_MASK_BITS = 6

_CHUNKS_DDL = "doc_id long, chunk_idx long, chunk_len long, chunk_hash string"


def cdc_chunks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per content-defined chunk: (doc_id, chunk_idx, chunk_len,
    chunk_hash).  Empty documents emit no rows."""
    import hashlib

    import numpy as np
    import pandas as pd

    w, prime, mod, mask = CDC_WINDOW, CDC_PRIME, CDC_MOD, (1 << CDC_MASK_BITS) - 1
    pw = (prime ** np.arange(w, dtype=np.int64)).astype(np.int64)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for doc_id, text in zip(b[id_col], b[text_col]):
                if text is None:
                    continue
                data = str(text).encode("utf-8")
                n = len(data)
                if n == 0:
                    continue
                cuts = []
                if n >= w:
                    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                    h = np.convolve(arr, pw, mode="valid") % mod
                    # h[t] is the hash ending at 1-indexed position t + w
                    cuts = (np.flatnonzero((h & mask) == 0) + w).tolist()
                if not cuts or cuts[-1] != n:
                    cuts.append(n)
                start = 0
                for idx, end in enumerate(cuts):
                    piece = data[start:end]
                    rows.append(
                        (
                            int(doc_id),
                            idx,
                            len(piece),
                            hashlib.md5(piece).hexdigest(),
                        )
                    )
                    start = end
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "chunk_len", "chunk_hash"]
            )

    return df.select(id_col, text_col).mapInPandas(run, _CHUNKS_DDL)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Corpus-level chunk-store dedup report from :func:`cdc_chunks` rows:
    ONE row (total_chunks, distinct_chunks, total_bytes, unique_bytes,
    savings) — ``unique_bytes`` stores each distinct chunk once,
    ``savings = round(1 - unique/total, 6)``.  Two map-side-combined
    aggregates (per-hash, then global); no window, no join."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count("*").cast("long").alias("_n"),
        F.min("chunk_len").cast("long").alias("_len"),
    )
    return per_hash.agg(
        F.sum("_n").cast("long").alias("total_chunks"),
        F.count("*").cast("long").alias("distinct_chunks"),
        F.sum(F.col("_n") * F.col("_len")).cast("long").alias("total_bytes"),
        F.sum("_len").cast("long").alias("unique_bytes"),
    ).select(
        "total_chunks",
        "distinct_chunks",
        "total_bytes",
        "unique_bytes",
        F.round(
            1.0 - F.col("unique_bytes") / F.col("total_bytes"), 6
        ).alias("savings"),
    )
