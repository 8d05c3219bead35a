"""BPE training/encoding vs a pure-Python reference (operators/bpe.py)."""

from __future__ import annotations

import re
from collections import Counter


def _py_vocab(texts):
    c = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                c[w] += 1
    return c


def _py_apply(segs, a, b):
    out = []
    for x in segs:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_train(texts, n_merges):
    vocab = {w: list(w) for w in _py_vocab(texts)}
    counts = _py_vocab(texts)
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, segs in vocab.items():
            for i in range(len(segs) - 1):
                pc[(segs[i], segs[i + 1])] += counts[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {w: _py_apply(s, *best) for w, s in vocab.items()}
    return merges


def _py_encode(text, merges):
    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    segs = [list(w) for w in words]
    for a, b in merges:
        segs = [_py_apply(s, a, b) for s in segs]
    return words, segs


def test_bpe_train_matches_python_reference(spark):
    from eget_spark.operators.bpe import bpe_train

    texts = [
        "lower lower lowest low low low newer newer new wide wider widest",
        "the newest lowest slower slowest newer wide low",
        "aaa aaaa aa a banana bandana",
    ] * 3
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    got = bpe_train(df, "text", n_merges=8)
    want = _py_train(texts, 8)
    assert got == want
    # greedy left-to-right: merging 'aa' on 'aaaa' yields ['aa','aa'],
    # on 'aaa' yields ['aa','a'] — the python oracle encodes that rule,
    # so list equality above already pins it; sanity: merges are unique
    assert len(set(got)) == len(got)


def test_bpe_encode_matches_python_reference(spark):
    from eget_spark.operators.bpe import bpe_encode, bpe_train

    texts = ["banana band bandana ana anna", "aaa aaaa banana low lower"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    merges = bpe_train(df, "text", n_merges=6)
    got = {r["id"]: r for r in bpe_encode(df, "id", "text", merges).collect()}
    for i, t in enumerate(texts):
        words, segs = _py_encode(t, merges)
        r = got[i]
        assert r["n_words"] == len(words)
        assert r["n_char_tokens"] == sum(len(w) for w in words)
        assert r["n_bpe_tokens"] == sum(len(s) for s in segs)
        assert list(r["tokens"]) == [tok for s in segs for tok in s]
    # compression: merges can only shrink or keep the token count
    assert all(r["n_bpe_tokens"] <= r["n_char_tokens"] for r in got.values())


def test_bpe_encode_empty_and_no_merges(spark):
    from eget_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(0, ""), (1, "ab")], "id long, text string")
    got = {r["id"]: r for r in bpe_encode(df, "id", "text", []).collect()}
    assert got[0]["n_words"] == 0 and got[0]["n_bpe_tokens"] == 0
    assert list(got[1]["tokens"]) == ["a", "b"]
