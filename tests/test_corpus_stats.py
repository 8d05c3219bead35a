"""Zipf / Heaps corpus-law fits vs pure-Python oracles replaying the
pinned milli-unit OLS contract."""

from __future__ import annotations

import math
import re

TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


def _toks(text):
    return [t for t in TOKEN_SPLIT.split(text.lower()) if t]


def _milli(x):
    # Spark F.round is HALF_UP on the decimal representation; ln values
    # here are irrational (never exactly .5 in binary), so round() agrees
    return int(round(math.log(x) * 1e3))


def _ols(points):
    n = len(points)
    sx = sum(x for x, _ in points)
    sy = sum(y for _, y in points)
    sxy = sum(x * y for x, y in points)
    sxx = sum(x * x for x, y in points)
    syy = sum(y * y for x, y in points)
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    intercept = (sy - slope * sx) / n / 1e3
    r2 = cov * cov / (varx * vary) if vary > 0 else None
    rnd = lambda v: None if v is None else round(v, 6)
    return n, rnd(slope), rnd(intercept), rnd(r2)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


CORPUS = [
    "the cat sat on the mat",
    "the dog ate the cat food",
    "a cat and a dog and a bird",
    "the bird sat on the dog",
    "zip zap zip the mat",
]


def test_zipf_fit_matches_python_oracle(spark):
    from eget_spark.operators.corpus_stats import zipf_fit

    counts: dict[str, int] = {}
    for t in CORPUS:
        for w in _toks(t):
            counts[w] = counts.get(w, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (_milli(i + 1), _milli(c)) for i, (_, c) in enumerate(ranked)
    ]
    _, slope, intercept, r2 = _ols(pts)
    n_tokens = sum(counts.values())

    row = zipf_fit(_docs_df(spark, CORPUS)).collect()[0]
    assert row["n_types"] == len(counts)
    assert row["n_tokens"] == n_tokens
    assert row["hapax"] == sum(1 for c in counts.values() if c == 1)
    assert row["dis"] == sum(1 for c in counts.values() if c == 2)
    assert row["ttr"] == round(len(counts) / n_tokens, 6)
    assert row["zipf_slope"] == slope
    assert row["zipf_intercept"] == intercept
    assert row["zipf_r2"] == r2
    # a rank-frequency fit always slopes down
    assert row["zipf_slope"] < 0


def test_heaps_fit_matches_python_oracle(spark):
    from eget_spark.operators.corpus_stats import heaps_fit

    seen: set[str] = set()
    n_cum = v_cum = 0
    pts = []
    for t in CORPUS:
        ws = _toks(t)
        n_cum += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                v_cum += 1
        if n_cum > 0 and v_cum > 0:
            pts.append((_milli(n_cum), _milli(v_cum)))
    n, beta, intercept, r2 = _ols(pts)

    row = heaps_fit(_docs_df(spark, CORPUS)).collect()[0]
    assert row["n_points"] == n == len(CORPUS)
    assert row["heaps_beta"] == beta
    assert row["heaps_intercept"] == intercept
    assert row["heaps_r2"] == r2
    # vocabulary grows sublinearly but grows: 0 < beta < 1
    assert 0 < row["heaps_beta"] < 1


def test_heaps_pure_repetition_beta_zero(spark):
    from eget_spark.operators.corpus_stats import heaps_fit

    # same single word forever: V pinned at 1 -> ln V = 0 for every
    # checkpoint -> slope exactly 0, r2 NULL (vary == 0)
    row = heaps_fit(_docs_df(spark, ["spam spam", "spam", "spam spam"]))
    got = row.collect()[0]
    assert got["heaps_beta"] == 0.0
    assert got["heaps_r2"] is None


def test_zipf_uniform_corpus_slope_zero(spark):
    from eget_spark.operators.corpus_stats import zipf_fit

    # every type occurs exactly once: ln(cnt) = 0 everywhere -> slope 0,
    # hapax == n_types, ttr == 1
    row = zipf_fit(_docs_df(spark, ["alpha beta", "gamma delta"])).collect()[0]
    assert row["zipf_slope"] == 0.0
    assert row["hapax"] == row["n_types"] == 4
    assert row["ttr"] == 1.0
