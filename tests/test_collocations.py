"""Collocation mining (PMI + Dunning LLR) vs a pure-Python replay."""

from __future__ import annotations

import math
import re

TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


def _toks(text):
    return [t for t in TOKEN_SPLIT.split(text.lower()) if t]


def _py_collocations(texts, min_count=2, k=100):
    c12: dict[tuple[str, str], int] = {}
    for text in texts:
        ts = _toks(text)
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for (a, b), n in c12.items():
        c1[a] = c1.get(a, 0) + n
        c2[b] = c2.get(b, 0) + n
    t = sum(c12.values())

    def term(kk, row, col):
        return kk * math.log(kk * t / (row * col)) if kk > 0 else 0.0

    rows = []
    for (a, b), n in c12.items():
        if n < min_count:
            continue
        ca, cb = c1[a], c2[b]
        llr = 2.0 * (
            term(n, ca, cb)
            + term(ca - n, ca, t - cb)
            + term(cb - n, t - ca, cb)
            + term(t - ca - cb + n, t - ca, t - cb)
        )
        pmi = math.log(n * t / (ca * cb))
        rows.append(
            (a, b, n, ca, cb, round(pmi * 1e6), round(llr * 1e6))
        )
    rows.sort(key=lambda r: (-r[6], r[0], r[1]))
    return rows[:k]


def _run(spark, texts, **kw):
    from eget_spark.operators.collocations import collocation_scores

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = collocation_scores(df, **kw).collect()
    return [
        (r["w1"], r["w2"], r["c12"], r["c1"], r["c2"], r["pmi_micro"], r["llr_micro"])
        for r in out
    ]


TEXTS = [
    "new york is big and new york is old but a new day dawns in york",
    "the cat sat on the mat and the cat ate the mat",
    "new york new york so good they named it twice",
    "a new car and a new house in old york",
]


def test_collocations_match_python_replay(spark):
    assert _run(spark, TEXTS, min_count=2) == _py_collocations(TEXTS, min_count=2)


def test_strong_pair_beats_chance_pair(spark):
    rows = _run(spark, TEXTS, min_count=2)
    got = {(r[0], r[1]): r for r in rows}
    assert ("new", "york") in got
    ny = got[("new", "york")]
    # "new york" repeats far beyond chance: positive PMI, top-5 LLR,
    # and it has the highest raw pair count of any surviving pair
    top5 = sorted((r[6] for r in rows), reverse=True)[:5]
    assert ny[5] > 0 and ny[6] in top5
    assert ny[2] == max(r[2] for r in rows)


def test_min_count_filters(spark):
    rows = _run(spark, TEXTS, min_count=3)
    assert all(r[2] >= 3 for r in rows)
    assert ("new", "york") in {(r[0], r[1]) for r in rows}


def test_margins_are_bigram_margins(spark):
    rows = _run(spark, TEXTS, min_count=2)
    for r in rows:
        # every cell of the 2x2 table is non-negative by construction
        assert r[3] >= r[2] and r[4] >= r[2]
