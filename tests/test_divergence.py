"""Per-group unigram divergence vs a pure-Python replay."""

from __future__ import annotations

import math
import re

TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


def _toks(text):
    return [t for t in TOKEN_SPLIT.split(text.lower()) if t]


def _py_divergences(rows):
    gt: dict[tuple[str, str], int] = {}
    for grp, text in rows:
        for t in _toks(text):
            gt[(grp, t)] = gt.get((grp, t), 0) + 1
    n_g: dict[str, int] = {}
    n_t: dict[str, int] = {}
    for (g, t), k in gt.items():
        n_g[g] = n_g.get(g, 0) + k
        n_t[t] = n_t.get(t, 0) + k
    n = sum(n_t.values())
    out = {}
    for (g, t), k in gt.items():
        p = k / n_g[g]
        q = n_t[t] / n
        a = out.setdefault(g, [0, 0, 0, 0, 0])
        a[0] += k
        a[1] += 1
        a[2] += round(-p * math.log(p) * 1e6)
        a[3] += round(-p * math.log(q) * 1e6)
        a[4] += round(p * math.log(p / q) * 1e6)
    return sorted((g, *v) for g, v in out.items())


def _run(spark, rows):
    from eget_spark.operators.divergence import group_divergences

    df = spark.createDataFrame(rows, "source string, text string")
    out = group_divergences(df, "source", "text").collect()
    return [
        (r["source"], r["n_toks"], r["n_types"], r["h_micro"], r["ce_micro"],
         r["kl_micro"])
        for r in out
    ]


ROWS = [
    ("news", "stocks fell on tuesday as markets weighed inflation data"),
    ("news", "the central bank held rates steady citing inflation"),
    ("forum", "lol that build is so broken buff the mage nerf the rogue"),
    ("forum", "anyone else stuck on the boss fight lol"),
    ("docs", "the function returns a dataframe partitioned by key"),
]


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_divergences(ROWS)


def test_single_group_has_zero_kl(spark):
    rows = [("only", "a b c a b"), ("only", "c a d")]
    out = _run(spark, rows)
    assert len(out) == 1
    g, n_toks, n_types, h, ce, kl = out[0]
    # one group IS the corpus: p == q for every token
    assert kl == 0 and ce == h and n_toks == 8 and n_types == 4


def test_identical_groups_have_zero_kl(spark):
    rows = [("a", "x y z x"), ("b", "x y z x")]
    for g, n_toks, n_types, h, ce, kl in _run(spark, rows):
        assert kl == 0 and ce == h


def test_disjoint_group_has_positive_kl(spark):
    rows = [("a", "x x x x"), ("b", "y y y y"), ("b", "y y y y")]
    out = {r[0]: r for r in _run(spark, rows)}
    # group a: p(x)=1, q(x)=4/12 -> KL = ln(3)
    assert out["a"][5] == round(math.log(3) * 1e6)
    assert out["b"][5] == round(math.log(12 / 8) * 1e6)
