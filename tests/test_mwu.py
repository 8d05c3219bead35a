"""Mann-Whitney U vs a pure-Python replay (midranks, tie-corrected
normal approximation, pinned A&S two-sided tail)."""

from __future__ import annotations

import math
from collections import Counter


def _erfc_pos(x: float) -> float:
    t = 1.0 / (1.0 + 0.3275911 * x)
    return (
        t
        * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t
           * (-1.453152027 + t * 1.061405429))))
    ) * math.exp(-(x * x))


def _py_mwu(rows, a, b):
    va = sorted(v for g, v in rows if g == a)
    vb = sorted(v for g, v in rows if g == b)
    n_a, n_b = len(va), len(vb)
    nn = n_a + n_b
    allv = sorted(va + vb)
    ties = Counter(allv)
    # doubled midrank per distinct value
    rmin = {}
    r = 1
    for v in sorted(ties):
        rmin[v] = r
        r += ties[v]
    ra_x2 = sum(2 * rmin[v] + ties[v] - 1 for v in va)
    u_a_x2 = ra_x2 - n_a * (n_a + 1)
    t3t = sum(t * t * t - t for t in ties.values())
    sigma = math.sqrt(
        (float(n_a) * float(n_b))
        * float(nn * (nn - 1) * (nn + 1) - t3t)
        / (12.0 * float(nn) * float(nn - 1))
    )
    z = float(u_a_x2 - n_a * n_b) / (2.0 * sigma)
    p = _erfc_pos(abs(z) * 0.7071067811865476)
    p_ppm = int(math.floor(1e6 * p + 0.5))
    auc_ppm = u_a_x2 * 500000 // (n_a * n_b)
    return (n_a, n_b, u_a_x2, t3t, round(z, 6), p_ppm, auc_ppm)


def _run(spark, rows, a, b):
    from eget_spark.operators.drift import mann_whitney_u

    df = spark.createDataFrame(rows, "cohort string, value long")
    r, = mann_whitney_u(df, "cohort", "value", a, b).collect()
    return (r["n_a"], r["n_b"], r["u_a_x2"], r["t3t"], r["z"],
            r["p_ppm"], r["auc_ppm"])


# shifted cohort with heavy ties (the tie correction must matter)
ROWS = (
    [("clean", 100 + (i * 7) % 11) for i in range(40)]
    + [("stepped", 115 + (i * 5) % 11) for i in range(25)]
    + [("other", 999)] * 5  # excluded cohort
)


def test_matches_python_replay(spark):
    assert _run(spark, ROWS, "stepped", "clean") == _py_mwu(
        ROWS, "stepped", "clean"
    )


def test_direction(spark):
    n_a, n_b, u_a_x2, _, z, p_ppm, auc_ppm = _run(
        spark, ROWS, "stepped", "clean"
    )
    # stepped dominates: AUC far above 1/2, z positive, p tiny
    assert auc_ppm > 900_000 and z > 3.0 and p_ppm < 1_000
    # symmetry: swapping cohorts mirrors U around n_a*n_b (and the
    # replay agrees on the swapped direction too)
    m = _run(spark, ROWS, "clean", "stepped")
    assert m[2] == 2 * n_a * n_b - u_a_x2
    assert m == _py_mwu(ROWS, "clean", "stepped")


def test_identical_cohorts_null(spark):
    rows = [("a", v % 13) for v in range(50)] + [
        ("b", v % 13) for v in range(50)
    ]
    n_a, n_b, u_a_x2, t3t, z, p_ppm, auc_ppm = _run(spark, rows, "a", "b")
    assert _py_mwu(rows, "a", "b") == (
        n_a, n_b, u_a_x2, t3t, z, p_ppm, auc_ppm
    )
    # perfectly matched cohorts: U exactly centered, p = 1
    assert u_a_x2 == n_a * n_b and z == 0.0 and p_ppm == 1_000_000
    assert auc_ppm == 500_000


def test_all_ties_single_value(spark):
    """Degenerate ledger (one distinct value): sigma = 0 -> z NULL-free
    guard is the caller's job; here nn(nn-1)(nn+1) == t3t so z is NaN —
    pin that both engines agree it is not a finite discovery."""
    rows = [("a", 7)] * 4 + [("b", 7)] * 4
    from eget_spark.operators.drift import mann_whitney_u

    df = spark.createDataFrame(rows, "cohort string, value long")
    r, = mann_whitney_u(df, "cohort", "value", "a", "b").collect()
    assert r["u_a_x2"] == r["n_a"] * r["n_b"]
    assert r["z"] is None or math.isnan(r["z"])
