"""Burrows' Delta vs a pure-Python replay of the pinned variant."""

from __future__ import annotations

import math
import re
from collections import Counter


def _py_delta(rows, k=50):
    gw: dict[str, Counter] = {}
    for grp, text in rows:
        c = gw.setdefault(grp, Counter())
        c.update(t for t in re.split(r"[^a-z0-9]+", text.lower()) if t)
    totals = {g: sum(c.values()) for g, c in gw.items()}
    corpus = Counter()
    for c in gw.values():
        corpus.update(c)
    panel = [t for t, _ in sorted(corpus.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:k]]
    groups = sorted(gw)
    s = len(groups)
    f = {
        (g, t): gw[g].get(t, 0) * 1_000_000 // totals[g]
        for g in groups
        for t in panel
    }
    z = {}
    for t in panel:
        vals = [f[(g, t)] for g in groups]
        sum_f = sum(vals)
        sum_f2 = sum(v * v for v in vals)
        varnum = s * sum_f2 - sum_f * sum_f
        if varnum <= 0:
            continue
        for g in groups:
            x = (1e6 * float(s * f[(g, t)] - sum_f)
                 / math.sqrt(float(varnum)))
            # round half away from zero, matching Spark/DuckDB round()
            z[(g, t)] = int(math.copysign(math.floor(abs(x) + 0.5), x))
    out = {}
    words = sorted({t for (_, t) in z})
    for i, ga in enumerate(groups):
        for gb in groups[i + 1:]:
            tot = sum(abs(z[(ga, t)] - z[(gb, t)]) for t in words)
            out[(ga, gb)] = (len(words), tot // len(words))
    return out


ROWS = [
    # two "template farm" sources sharing a generator: identical
    # function-word skeleton, different topical nouns
    ("farm1", "the quick offer and the best offer in the shop today "
              "and the shop has the offer"),
    ("farm2", "the quick deal and the best deal in the store today "
              "and the store has the deal"),
    # a human-ish source with a different function-word profile
    ("blog", "we tried it ourselves because honestly nothing about it "
             "seemed right until we saw how it behaved"),
]


def _run(spark, rows, k=50):
    from eget_spark.operators.stylometry import burrows_delta

    df = spark.createDataFrame(rows, "source string, text string")
    out = burrows_delta(df, "source", "text", k=k).collect()
    return {
        (r["source_a"], r["source_b"]): (r["n_words"], r["delta_micro"])
        for r in out
    }


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_delta(ROWS, 50)


def test_shared_generator_is_closest_pair(spark):
    got = _run(spark, ROWS)
    assert got[("farm1", "farm2")][1] < got[("blog", "farm1")][1]
    assert got[("farm1", "farm2")][1] < got[("blog", "farm2")][1]


def test_small_panel(spark):
    assert _run(spark, ROWS, k=5) == _py_delta(ROWS, 5)


def test_zero_variance_words_excluded(spark):
    rows = [
        ("a", "same same same alpha"),
        ("b", "same same same beta"),
    ]
    got = _run(spark, rows, k=10)
    assert got == _py_delta(rows, 10)
    # 'same' has equal ppm rate in both groups -> excluded from panel
    (n_words, _), = got.values()
    assert n_words == 2  # alpha, beta only
