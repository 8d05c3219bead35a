"""Kruskal-Wallis and Chao1 richness vs pure-Python replays."""

from __future__ import annotations

import math
import re
from collections import Counter


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


# ---------------- Kruskal-Wallis ----------------

def _py_kw(rows, groups):
    pts = [(groups.index(g), v) for g, v in rows if g in groups]
    k = len(groups)
    nn = len(pts)
    ties = Counter(v for _, v in pts)
    rmin = {}
    r = 1
    for v in sorted(ties):
        rmin[v] = r
        r += ties[v]
    m = [0] * k
    rx2 = [0] * k
    for j, v in pts:
        m[j] += 1
        rx2[j] += 2 * rmin[v] + ties[v] - 1
    t3t = sum(t * t * t - t for t in ties.values())
    if nn <= 1 or t3t >= nn ** 3 - nn:
        h = p = None
    else:
        s = sum(
            float(rx2[j]) * float(rx2[j]) / float(m[j]) for j in range(k)
        )
        h_raw = (3.0 * s) / (float(nn) * float(nn + 1)) - 3.0 * float(
            nn + 1
        )
        corr = 1.0 - float(t3t) / (
            float(nn) * float(nn) * float(nn) - float(nn)
        )
        h = round(h_raw / corr, 6)
        dfree = k - 1
        if dfree >= 2 and dfree % 2 == 0:
            half = (h_raw / corr) / 2.0
            series = sum(
                half ** i / math.factorial(i) for i in range(dfree // 2)
            )
            p = _round_half_away(1e6 * math.exp(-half) * series)
        else:
            p = None
    return (nn, t3t, tuple(m), tuple(rx2), h, p)


KW_ROWS = (
    [("t0", 100 + (i * 7) % 9) for i in range(30)]
    + [("t1", 104 + (i * 5) % 9) for i in range(24)]
    + [("t2", 109 + (i * 3) % 9) for i in range(18)]
    + [("skip", 999)] * 4
)


def _run_kw(spark, rows, groups):
    from eget_spark.operators.drift import kruskal_wallis

    df = spark.createDataFrame(rows, "tier string, value long")
    r, = kruskal_wallis(df, "tier", "value", groups).collect()
    k = len(groups)
    return (
        r["nn"], r["t3t"],
        tuple(r[f"m_{j}"] for j in range(1, k + 1)),
        tuple(r[f"r_{j}"] for j in range(1, k + 1)),
        r["h"], r["p_ppm"],
    )


def test_kw_matches_replay(spark):
    groups = ["t0", "t1", "t2"]
    assert _run_kw(spark, KW_ROWS, groups) == _py_kw(KW_ROWS, groups)


def test_kw_detects_shift(spark):
    _, _, _, _, h, p = _run_kw(spark, KW_ROWS, ["t0", "t1", "t2"])
    assert h > 9.21 and p < 10_000  # chi2(2) 1% critical value


def test_kw_null_under_identical(spark):
    rows = [(t, v % 7) for t in ("a", "b", "c") for v in range(21)]
    got = _run_kw(spark, rows, ["a", "b", "c"])
    assert got == _py_kw(rows, ["a", "b", "c"])
    assert got[4] is not None and abs(got[4]) < 0.5
    assert got[5] > 700_000  # p far from significance


def test_kw_even_k_gives_null_p(spark):
    rows = [("a", i % 5) for i in range(10)] + [
        ("b", 2 + i % 5) for i in range(10)
    ]
    got = _run_kw(spark, rows, ["a", "b"])
    assert got == _py_kw(rows, ["a", "b"])
    assert got[4] is not None and got[5] is None  # df=1 odd: no p


def test_kw_all_tied_null_h(spark):
    rows = [("a", 7)] * 3 + [("b", 7)] * 3 + [("c", 7)] * 3
    got = _run_kw(spark, rows, ["a", "b", "c"])
    assert got[4] is None and got[5] is None


# ---------------- Chao1 richness ----------------

def _py_chao(rows):
    by_grp: dict[str, Counter] = {}
    for g, text in rows:
        c = by_grp.setdefault(g, Counter())
        c.update(t for t in re.split(r"[^a-z0-9]+", text.lower()) if t)
    out = {}
    for g, c in sorted(by_grp.items()):
        n = sum(c.values())
        v = len(c)
        f1 = sum(1 for x in c.values() if x == 1)
        f2 = sum(1 for x in c.values() if x == 2)
        unseen = _round_half_away(
            float(f1 * (f1 - 1)) / float(2 * (f2 + 1))
        )
        p0 = f1 * 1_000_000 // n
        out[g] = (n, v, f1, f2, v + unseen, unseen, p0, 1_000_000 - p0)
    return out


CHAO_ROWS = [
    ("rich", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ("poor", "spam spam spam spam ham ham eggs eggs"),
    ("mixed", "one two two three three four four five six seven"),
]


def _run_chao(spark, rows):
    from eget_spark.operators.corpus_stats import chao_richness

    df = spark.createDataFrame(rows, "source string, text string")
    out = chao_richness(df, "source", "text").collect()
    return {
        r["grp"]: (r["n_toks"], r["n_types"], r["f1"], r["f2"],
                   r["chao1_est"], r["unseen_types"], r["p0_ppm"],
                   r["coverage_ppm"])
        for r in out
    }


def test_chao_matches_replay(spark):
    assert _run_chao(spark, CHAO_ROWS) == _py_chao(CHAO_ROWS)


def test_chao_direction(spark):
    got = _run_chao(spark, CHAO_ROWS)
    # all-hapax source: huge unseen mass, zero Good-Turing coverage
    assert got["rich"][5] > 0 and got["rich"][7] == 0
    # no hapax at all: estimator collapses to V, full coverage
    assert got["poor"][4] == got["poor"][1] and got["poor"][7] == 1_000_000
