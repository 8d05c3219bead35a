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


# --- lexical richness --------------------------------------------------------

def _py_richness(rows):
    import math
    import re
    from collections import Counter, defaultdict

    gt: dict[str, Counter] = defaultdict(Counter)
    for g, text in rows:
        for t in re.split(r"[^a-z0-9]+", text.lower()):
            if t:
                gt[g][t] += 1
    out = []
    for g in sorted(gt):
        c = gt[g]
        n = sum(c.values())
        v = len(c)
        v1 = sum(1 for x in c.values() if x == 1)
        v2 = sum(1 for x in c.values() if x == 2)
        m2 = sum(x * x for x in c.values())
        yk = round((m2 - n) * 1e4 / (float(n) * float(n)), 6)
        hc = round(math.log(v) / math.log(n), 6) if n > 1 else None
        gr = round(v / math.sqrt(n), 6)
        out.append((g, n, v, v1, v2, yk, hc, gr,
                    v * 10**6 // n, v1 * 10**6 // v))
    return out


RICH_ROWS = [
    ("varied", "every single word in this sentence differs completely"),
    ("varied", "novel tokens keep arriving without repetition anywhere"),
    ("template", "buy now " * 20),
    ("template", "buy now best price " * 10),
    ("tiny", "word"),
]


def _run_richness(spark, rows):
    from eget_spark.operators.corpus_stats import lexical_richness

    df = spark.createDataFrame(rows, "source string, text string")
    out = lexical_richness(df, "source", "text").collect()
    return [
        (r["source"], r["n_toks"], r["n_types"], r["hapax"], r["dis"],
         r["yule_k"], r["herdan_c"], r["guiraud_r"], r["ttr_ppm"],
         r["hapax_ppm"])
        for r in out
    ]


def test_richness_matches_python_replay(spark):
    assert _run_richness(spark, RICH_ROWS) == _py_richness(RICH_ROWS)


def test_template_farm_has_huge_yule_k(spark):
    got = {r[0]: r for r in _run_richness(spark, RICH_ROWS)}
    assert got["template"][5] > 50 * got["varied"][5]


def test_all_hapax_corpus_has_zero_k(spark):
    # every type once: m2 == N -> K exactly 0
    rows = [("x", "alpha beta gamma delta epsilon")]
    got = _run_richness(spark, rows)[0]
    assert got[5] == 0.0 and got[9] == 10**6


def test_single_token_group_null_herdan(spark):
    got = {r[0]: r for r in _run_richness(spark, RICH_ROWS)}
    assert got["tiny"][6] is None and got["tiny"][1] == 1
