"""Property tests for the q164-q166 batch (token windows, keyword
extraction) against pure-Python references."""

from __future__ import annotations

import random
import re


def _py_windows(text, w, s):
    toks = re.split(r"\s+", text.strip().lower())
    n = len(toks)
    n_win = 1 + max(0, -(-(n - w) // s))
    out = []
    for i in range(n_win):
        win = toks[i * s: i * s + w]
        out.append((i, len(win), " ".join(win)))
    return out


def test_token_windows_random(spark):
    from eget_spark.operators.chunker import token_windows

    rng = random.Random(59)
    rows = [
        (i, " ".join(f"w{rng.randint(0, 30)}"
                     for _ in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    for w, s in [(8, 8), (8, 5), (5, 8), (1, 1)]:
        got = {}
        for r in token_windows(df, "id", "text", w, s).collect():
            got.setdefault(r["id"], []).append(
                (r["win_idx"], r["n_win_tokens"], r["win_text"])
            )
        for i, text in rows:
            assert sorted(got[i]) == _py_windows(text, w, s), (i, w, s)


def test_token_windows_edges(spark):
    from eget_spark.operators.chunker import token_windows
    import pytest

    df = spark.createDataFrame([(0, "a b c")], "id long, text string")
    # exact multiple: 3 tokens, w=s=3 -> exactly one window
    rows = token_windows(df, "id", "text", 3, 3).collect()
    assert [(r["win_idx"], r["win_text"]) for r in rows] == [(0, "a b c")]
    # whitespace-only text keeps the tokenizer's [''] artifact: 1 window
    df2 = spark.createDataFrame([(0, "   ")], "id long, text string")
    rows2 = token_windows(df2, "id", "text", 4, 4).collect()
    assert [(r["n_win_tokens"], r["win_text"]) for r in rows2] == [(1, "")]
    with pytest.raises(ValueError):
        token_windows(df, "id", "text", 0, 4)


def test_keyword_extract_reference(spark):
    from eget_spark.operators.search import keyword_extract

    rows = [
        (0, "apple banana apple cherry"),
        (1, "banana banana durian"),
        (2, "cherry durian elder elder elder"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {}
    for r in keyword_extract(df, "id", "text", top_k=2).collect():
        got.setdefault(r["id"], []).append(
            (r["rank"], r["term"], r["tf"], r["idf_fp"], r["score_fp"])
        )
    # python reference
    import collections
    tfs = {i: collections.Counter(t.split()) for i, t in rows}
    dfreq = collections.Counter(
        term for c in tfs.values() for term in c
    )
    n = len(rows)
    for i, _ in rows:
        scored = sorted(
            (
                (-tf * (n * 1_000_000 // dfreq[t]), t, tf)
                for t, tf in tfs[i].items()
            )
        )[:2]
        want = [
            (rk + 1, t, tf, n * 1_000_000 // dfreq[t],
             tf * (n * 1_000_000 // dfreq[t]))
            for rk, (_, t, tf) in enumerate(scored)
        ]
        assert sorted(got[i]) == want, i
