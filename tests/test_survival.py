"""Kaplan-Meier estimator vs a pure-Python product-limit replay."""

from __future__ import annotations

import math


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _py_km(rows):
    by_grp: dict[str, list[tuple[int, int]]] = {}
    for g, t, e in rows:
        by_grp.setdefault(g, []).append((t, e))
    out = []
    for g, pts in sorted(by_grp.items()):
        times = sorted({t for t, _ in pts})
        total = len(pts)
        left = 0
        cum = 0
        dead = False
        for t in times:
            d = sum(1 for tt, e in pts if tt == t and e == 1)
            c = sum(1 for tt, e in pts if tt == t and e == 0)
            n_risk = total - left
            if d > 0:
                if n_risk == d:
                    dead = True
                else:
                    cum += _round_half_away(
                        1e6 * math.log(float(n_risk - d) / float(n_risk))
                    )
            s = 0 if dead else _round_half_away(1e6 * math.exp(cum / 1e6))
            out.append((g, t, n_risk, d, c, s))
            left += d + c
    return out


ROWS = [
    # hostA: classic staircase with interleaved censoring
    ("hostA", 2, 1), ("hostA", 3, 0), ("hostA", 5, 1), ("hostA", 5, 1),
    ("hostA", 7, 0), ("hostA", 9, 1), ("hostA", 12, 0),
    # hostB: everyone dies at the last time -> sticky zero
    ("hostB", 1, 1), ("hostB", 4, 1), ("hostB", 4, 1),
    # hostC: fully censored -> flat curve at 1e6
    ("hostC", 3, 0), ("hostC", 6, 0),
]


def _run(spark, rows):
    from eget_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame(
        rows, "source string, duration long, event long"
    )
    out = kaplan_meier(df, "source", "duration", "event").collect()
    return [
        (r["grp"], r["t"], r["n_risk"], r["d_events"], r["c_censored"],
         r["s_ppm"])
        for r in out
    ]


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_km(ROWS)


def test_curve_shape(spark):
    got = {(g, t): s for g, t, _, _, _, s in _run(spark, ROWS)}
    # hostA: monotone nonincreasing, strictly drops at event times
    a = [got[("hostA", t)] for t in (2, 3, 5, 7, 9, 12)]
    assert a == sorted(a, reverse=True)
    assert a[0] < 1_000_000 and a[1] == a[0]  # censor time flat
    # hostB dies out exactly
    assert got[("hostB", 4)] == 0
    # hostC never drops
    assert got[("hostC", 3)] == got[("hostC", 6)] == 1_000_000


def test_no_censoring_equals_ecdf(spark):
    """Without censoring, KM is the empirical survival function."""
    rows = [("g", t, 1) for t in (1, 1, 2, 3, 3, 3, 8)]
    got = _run(spark, rows)
    assert got == _py_km(rows)
    n = 7
    for (_, t, n_risk, d, _, s) in got:
        surv = sum(1 for tt in (1, 1, 2, 3, 3, 3, 8) if tt > t)
        assert abs(s - round(1e6 * surv / n)) <= 2  # quantized product
