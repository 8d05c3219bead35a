"""URL-seen membership at scale (D1, SURVEY.md §2.3).

The reference keeps one in-memory ``Set[str]`` under an asyncio lock
(queue_manager.py:27,46-57).  At 10^10 URLs that is a distributed-membership
problem: we build a **partitioned Bloom filter** over the seen set (partials
built per partition in Arrow batches, OR-merged via a chunked distributed
reduce), broadcast it, and use it to pre-filter candidates; survivors (bloom
"maybe") are confirmed with an exact ``left_anti`` join so false positives
never drop a URL.  Bloom-negative candidates — the overwhelming majority in
steady state — skip the join entirely.

The filter is deterministic (blake2b double hashing), picklable, and
mergeable, so per-round deltas can be OR-ed into a running filter without
rebuilding from the full seen table.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class BloomFilter:
    """Plain mergeable Bloom filter over UTF-8 strings.

    Double hashing: one blake2b(url) 16-byte digest yields h1, h2;
    probe i = (h1 + i*h2) % m  (Kirsch-Mitzenmacher construction).
    """

    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m_bits = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros((m_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized(cls, expected: int, fpp: float = 0.01, max_bits: int = 1 << 33) -> "BloomFilter":
        expected = max(1, expected)
        m = int(-expected * math.log(fpp) / (math.log(2) ** 2))
        m = max(1024, min(m, max_bits))
        k = max(1, round(m / expected * math.log(2)))
        return cls(m, min(k, 16))

    @staticmethod
    def _h12(s: str) -> tuple[int, int]:
        d = hashlib.blake2b(s.encode("utf-8"), digest_size=16).digest()
        return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1

    def add_many(self, values) -> None:
        m, k = self.m_bits, self.k
        for v in values:
            if v is None:
                continue
            h1, h2 = self._h12(v)
            for i in range(k):
                idx = (h1 + i * h2) % m
                self.bits[idx >> 3] |= 1 << (idx & 7)

    def contains(self, v: str) -> bool:
        m, k = self.m_bits, self.k
        h1, h2 = self._h12(v)
        for i in range(k):
            idx = (h1 + i * h2) % m
            if not (self.bits[idx >> 3] >> (idx & 7)) & 1:
                return False
        return True

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m_bits, self.k) == (other.m_bits, other.k)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


_CHUNK_BYTES = 1 << 22  # 4 MiB merge chunks


def build_bloom(
    df: DataFrame, url_col: str, expected: int, fpp: float = 0.01
) -> BloomFilter:
    """Distributed build: per-partition partials via mapInPandas, OR-merged
    via a chunked groupBy so no single task holds more than one 4 MiB slice
    (the treeReduce-style merge of SURVEY.md D1, in DataFrame form)."""
    proto = BloomFilter.sized(expected, fpp)
    m_bits, k = proto.m_bits, proto.k
    nbytes = (m_bits + 7) // 8

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = BloomFilter(m_bits, k)
        seen_any = False
        for pdf in batches:
            if len(pdf):
                seen_any = True
                local.add_many(pdf[url_col])
        if not seen_any:
            return
        raw = local.bits.tobytes()
        rows = []
        for off in range(0, nbytes, _CHUNK_BYTES):
            chunk = raw[off : off + _CHUNK_BYTES]
            if any(chunk):  # skip all-zero slices
                rows.append({"off": off, "chunk": chunk})
        if rows:
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [T.StructField("off", T.LongType()), T.StructField("chunk", T.BinaryType())]
    )

    def or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.frombuffer(pdf["chunk"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["chunk"].iloc[1:]:
            np.bitwise_or(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame({"off": [pdf["off"].iloc[0]], "chunk": [acc.tobytes()]})

    merged = (
        df.select(url_col)
        .mapInPandas(partials, schema=schema)
        .groupBy("off")
        .applyInPandas(or_merge, schema=schema)
        .collect()
    )
    out = BloomFilter(m_bits, k)
    for row in merged:
        arr = np.frombuffer(row["chunk"], dtype=np.uint8)
        sl = out.bits[row["off"] : row["off"] + len(arr)]
        np.bitwise_or(sl, arr, out=sl)
    return out


def bloom_maybe_contains(spark, bloom: BloomFilter, url):
    """Column predicate: True iff the bloom *may* contain url.

    Broadcast once per filter build; the UDF closes over the broadcast, not
    the (large) driver object.
    """
    bc = spark.sparkContext.broadcast((bloom.m_bits, bloom.k, bloom.bits))

    @F.pandas_udf(T.BooleanType())
    def probe(urls: pd.Series) -> pd.Series:
        m, k, bits = bc.value
        bf = BloomFilter(m, k, bits)
        return urls.map(lambda u: u is not None and bf.contains(u))

    return probe(url)


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """J4/D1: candidates not yet seen.

    With a bloom: definite-negatives bypass the shuffle join; only bloom
    positives (seen URLs + false positives) are confirmed by the exact
    anti join, then unioned back.
    """
    if bloom is None:
        return candidates.join(seen, url_col, "left_anti")
    spark = candidates.sparkSession
    flagged = candidates.withColumn(
        "_maybe_seen", bloom_maybe_contains(spark, bloom, F.col(url_col))
    )
    definite_new = flagged.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    positives = flagged.where(F.col("_maybe_seen")).drop("_maybe_seen")
    # exact confirm WITHOUT shuffling the (huge) seen side: semi-join seen
    # against the broadcast positive set (seen is scanned in place), then
    # anti-join the positives against the (small) found set. In steady
    # state positives ~= duplicate links + bloom false positives — tiny
    # relative to seen, so both broadcasts are bounded by the frontier.
    found = seen.join(
        F.broadcast(positives.select(url_col)), url_col, "left_semi"
    )
    confirmed_new = positives.join(F.broadcast(found), url_col, "left_anti")
    return definite_new.unionByName(confirmed_new)
