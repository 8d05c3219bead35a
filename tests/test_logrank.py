"""Log-rank test vs a pure-Python replay of the pinned quantization."""

from __future__ import annotations

import math


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _erfc_pos(x: float) -> float:
    t = 1.0 / (1.0 + 0.3275911 * x)
    return (
        t
        * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t
           * (-1.453152027 + t * 1.061405429))))
    ) * math.exp(-(x * x))


def _py_logrank(rows, a, b):
    pts = [(1 if g == a else 0, t, e) for g, t, e in rows if g in (a, b)]
    n_a = sum(p[0] for p in pts)
    n = len(pts)
    times = sorted({t for _, t, _ in pts})
    left_a = left = 0
    n_times = sum_oe = sum_v = 0
    for t in times:
        d_a = sum(1 for ia, tt, e in pts if tt == t and e == 1 and ia)
        d = sum(1 for _, tt, e in pts if tt == t and e == 1)
        m_a = sum(1 for ia, tt, _ in pts if tt == t and ia)
        m = sum(1 for _, tt, _ in pts if tt == t)
        na_t = n_a - left_a
        n_t = n - left
        if d > 0 and n_t > 1:
            n_times += 1
            sum_oe += _round_half_away(
                1e6 * (float(d_a) - float(d) * float(na_t) / float(n_t))
            )
            sum_v += _round_half_away(
                1e6 * (float(d) * (float(na_t) / float(n_t))
                       * (1.0 - float(na_t) / float(n_t))
                       * float(n_t - d) / float(n_t - 1))
            )
        left_a += m_a
        left += m
    if sum_v > 0:
        z = float(sum_oe) / (1000.0 * math.sqrt(float(sum_v)))
        p = _erfc_pos(abs(z) * 0.7071067811865476)
        zz, pp = round(z, 6), _round_half_away(1e6 * p)
    else:
        zz = pp = None
    return (n_a, n - n_a, n_times, sum_oe, sum_v, zz, pp)


ROWS = (
    # short-lived cohort (events early) vs long-lived, with censoring
    [("fast", 1 + (i * 3) % 5, 0 if i % 5 == 0 else 1)
     for i in range(30)]
    + [("slow", 4 + (i * 7) % 12, 0 if i % 4 == 0 else 1)
       for i in range(25)]
    + [("other", 99, 1)] * 3  # excluded cohort
)


def _run(spark, rows, a, b):
    from eget_spark.operators.survival import log_rank

    df = spark.createDataFrame(
        rows, "cohort string, duration long, event long"
    )
    r, = log_rank(df, "cohort", "duration", "event", a, b).collect()
    return (r["n_a"], r["n_b"], r["n_times"], r["sum_oe_micro"],
            r["sum_v_micro"], r["z"], r["p_ppm"])


def test_matches_python_replay(spark):
    assert _run(spark, ROWS, "fast", "slow") == _py_logrank(
        ROWS, "fast", "slow"
    )


def test_detects_lifetime_gap(spark):
    n_a, n_b, n_times, oe, v, z, p_ppm = _run(spark, ROWS, "fast", "slow")
    # fast cohort dies MORE than expected: positive z, significant
    assert z > 2.0 and p_ppm < 50_000
    # antisymmetry: swapping cohorts flips the O-E sign exactly
    m = _run(spark, ROWS, "slow", "fast")
    assert m[3] == -oe and m[2] == n_times
    assert m == _py_logrank(ROWS, "slow", "fast")


def test_identical_cohorts_null(spark):
    rows = [("a", 1 + i % 6, 1 if i % 3 else 0) for i in range(24)] + [
        ("b", 1 + i % 6, 1 if i % 3 else 0) for i in range(24)
    ]
    got = _run(spark, rows, "a", "b")
    assert got == _py_logrank(rows, "a", "b")
    # perfectly matched cohorts: O-E exactly zero, p = 1
    assert got[3] == 0 and got[6] == 1_000_000


def test_no_events_null_z(spark):
    rows = [("a", 5, 0)] * 3 + [("b", 7, 0)] * 3
    got = _run(spark, rows, "a", "b")
    assert got == _py_logrank(rows, "a", "b")
    assert got[5] is None and got[6] is None
