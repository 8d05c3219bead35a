"""Mantel-Haenszel pooled odds ratio / CMH test vs a Python replay,
including a constructed Simpson's-paradox reversal."""

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


def _py_mh(rows, ga, gb):
    cells: dict[str, list[int]] = {}
    for st, g, y in rows:
        if g not in (ga, gb):
            continue
        c = cells.setdefault(st, [0, 0, 0, 0])
        i = (0 if g == ga else 2) + (0 if y else 1)
        c[i] += 1
    n_strata = sum_r = sum_s = sum_oe = sum_v = 0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        if n < 2 or a + b == 0 or c + d == 0:
            continue
        n_strata += 1
        sum_r += _round_half_away(1e6 * float(a) * float(d) / float(n))
        sum_s += _round_half_away(1e6 * float(b) * float(c) / float(n))
        sum_oe += _round_half_away(
            1e6 * (float(a) - float(a + b) * float(a + c) / float(n))
        )
        sum_v += _round_half_away(
            1e6 * (float(a + b) * float(c + d) * float(a + c)
                   * float(b + d)
                   / (float(n) * float(n) * float(n - 1)))
        )
    or_mh = (round(float(sum_r) / float(sum_s), 6)
             if sum_s > 0 else None)
    if sum_v > 0:
        z = float(sum_oe) / (1000.0 * math.sqrt(float(sum_v)))
        zz = round(z, 6)
        pp = _round_half_away(
            1e6 * _erfc_pos(abs(z) * 0.7071067811865476)
        )
    else:
        zz = pp = None
    return (n_strata, sum_r, sum_s, or_mh, sum_oe, sum_v, zz, pp)


def _simpson_rows():
    """A beats B inside EVERY tier, but B's allocation is skewed toward
    the easy tier so B wins the pooled raw comparison."""
    rows = []
    # easy tier: high success; B heavily allocated
    rows += [("easy", "A", 1)] * 18 + [("easy", "A", 0)] * 2
    rows += [("easy", "B", 1)] * 68 + [("easy", "B", 0)] * 12
    # hard tier: low success; A heavily allocated
    rows += [("hard", "A", 1)] * 26 + [("hard", "A", 0)] * 54
    rows += [("hard", "B", 1)] * 4 + [("hard", "B", 0)] * 16
    return rows


def _run(spark, rows, ga, gb):
    from eget_spark.operators.stratified import mantel_haenszel

    df = spark.createDataFrame(
        rows, "stratum string, fleet string, outcome long"
    )
    r, = mantel_haenszel(
        df, "stratum", "fleet", "outcome", ga, gb
    ).collect()
    return (r["n_strata"], r["sum_r_micro"], r["sum_s_micro"],
            r["or_mh"], r["sum_oe_micro"], r["sum_v_micro"], r["z"],
            r["p_ppm"])


def test_matches_python_replay(spark):
    rows = _simpson_rows()
    assert _run(spark, rows, "A", "B") == _py_mh(rows, "A", "B")


def test_simpson_reversal_resolved(spark):
    rows = _simpson_rows()
    # pooled raw rates LIE: B looks better
    a_tot = [r for r in rows if r[1] == "A"]
    b_tot = [r for r in rows if r[1] == "B"]
    a_rate = sum(y for _, _, y in a_tot) / len(a_tot)
    b_rate = sum(y for _, _, y in b_tot) / len(b_tot)
    assert a_rate < b_rate
    # MH pools within-stratum: A's advantage surfaces (OR > 1, z > 0)
    _, _, _, or_mh, _, _, z, _ = _run(spark, rows, "A", "B")
    assert or_mh > 1.0 and z > 0


def test_null_when_identical(spark):
    rows = []
    for st in ("t0", "t1"):
        for g in ("A", "B"):
            rows += [(st, g, 1)] * 6 + [(st, g, 0)] * 4
    got = _run(spark, rows, "A", "B")
    assert got == _py_mh(rows, "A", "B")
    assert got[3] == 1.0 and got[4] == 0 and got[7] == 1_000_000


def test_degenerate_strata_excluded(spark):
    # one usable stratum + one missing-group stratum + one singleton
    rows = (
        [("ok", "A", 1), ("ok", "A", 0), ("ok", "B", 1), ("ok", "B", 0)]
        + [("a_only", "A", 1)] * 5
        + [("tiny", "B", 1)]
    )
    got = _run(spark, rows, "A", "B")
    assert got == _py_mh(rows, "A", "B")
    assert got[0] == 1
