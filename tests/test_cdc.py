"""Content-defined chunking (operators/cdc.py): python rolling-hash
oracle parity, the shift-resistance property, edge cases, and the dedup
stats contract."""

from __future__ import annotations

import hashlib


def _py_chunks(text: str, w=8, prime=31, mod=1 << 20, mask=63):
    data = text.encode("utf-8")
    n = len(data)
    if n == 0:
        return []
    cuts = []
    for i in range(w, n + 1):  # 1-indexed end position
        h = sum(data[i - 1 - j] * prime**j for j in range(w)) % mod
        if h & mask == 0:
            cuts.append(i)
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    out, start = [], 0
    for idx, end in enumerate(cuts):
        piece = data[start:end]
        out.append((idx, len(piece), hashlib.md5(piece).hexdigest()))
        start = end
    return out


def test_cdc_chunks_match_python_oracle(spark):
    from eget_spark.operators.cdc import cdc_chunks

    rows = [
        (0, "the quick brown fox jumps over the lazy dog " * 20),
        (1, ""),                      # empty -> no rows
        (2, "short"),                 # < window -> one whole-text chunk
        (3, "x" * 8),                 # exactly one window
        (4, None),                    # null -> no rows
        (5, "abc def ghi jkl mno pqr stu vwx yz " * 37),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_len"], r["chunk_hash"])
        )
    for doc_id, text in rows:
        want = _py_chunks(text) if text is not None else []
        assert sorted(got.get(doc_id, [])) == want, doc_id
    # chunk lengths tile the document exactly
    assert sum(c[1] for c in got[0]) == len(rows[0][1])


def test_cdc_shift_resistance(spark):
    """An insertion near the front changes only chunks up to the first
    boundary after the edit — everything later re-hashes identically
    (the property revisit-dedup lacks and CDC exists for)."""
    from eget_spark.operators.cdc import cdc_chunks

    base = "segment %d of recurring page content with stable text. " * 1
    body = "".join(base % i for i in range(60))
    edited = "NEW BANNER INSERTED! " + body
    df = spark.createDataFrame(
        [(0, body), (1, edited)], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    h0 = [r["chunk_hash"] for r in sorted(
        (r for r in rows if r["doc_id"] == 0), key=lambda r: r["chunk_idx"])]
    h1 = [r["chunk_hash"] for r in sorted(
        (r for r in rows if r["doc_id"] == 1), key=lambda r: r["chunk_idx"])]
    # the boundary stream re-synchronizes after the first cut past the
    # edit: all but the first chunk of the original survive, in order
    suffix = 0
    while (
        suffix < min(len(h0), len(h1))
        and h0[-1 - suffix] == h1[-1 - suffix]
    ):
        suffix += 1
    assert suffix >= len(h0) - 1 >= 3


def test_cdc_dedup_stats(spark):
    from eget_spark.operators.cdc import cdc_chunks, cdc_dedup_stats

    text = "recurring boilerplate block that appears everywhere. " * 10
    df = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )
    s = cdc_dedup_stats(cdc_chunks(df)).collect()[0]
    assert s["total_bytes"] == 5 * len(text)
    # 5 identical docs (of an internally repetitive block): every distinct
    # chunk appears >= 5x, so the chunk store saves >= 80%
    assert s["total_chunks"] >= 5 * s["distinct_chunks"]
    assert s["unique_bytes"] * 5 <= s["total_bytes"]
    assert s["savings"] == round(1 - s["unique_bytes"] / s["total_bytes"], 6)
    assert s["savings"] >= 0.8
