"""Isotonic (PAV) recalibration and Brier decomposition vs Python
replays — the min-max closed form is checked against the classical
pool-adjacent-violators sweep (Ayer's theorem equality)."""

from __future__ import annotations

import math


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _bin_of(s, m):
    return min(s * m // 1_000_000, m - 1)


def _py_pav(rows, n_bins):
    bins: dict[int, list[int]] = {}
    for s, y in rows:
        b = _bin_of(s, n_bins)
        agg = bins.setdefault(b, [0, 0])
        agg[0] += 1
        agg[1] += y
    order = sorted(bins)
    # classical PAV stack sweep over (weight, mean) blocks
    stack: list[list[float]] = []  # [weight, sum]
    for b in order:
        n, pos = bins[b]
        stack.append([float(n), float(pos)])
        while len(stack) >= 2 and (
            stack[-2][1] / stack[-2][0] >= stack[-1][1] / stack[-1][0]
        ):
            w2, s2 = stack.pop()
            stack[-1][0] += w2
            stack[-1][1] += s2
    # expand blocks back to bins
    out = {}
    i = 0
    for w, s in stack:
        taken = 0
        while taken < int(w):
            b = order[i]
            n, pos = bins[b]
            out[b] = (n, pos, pos * 1_000_000 // n,
                      _round_half_away(1e6 * s / w))
            taken += n
            i += 1
    return out


def _run_pav(spark, rows, n_bins):
    from eget_spark.operators.calibration import isotonic_fit

    df = spark.createDataFrame(rows, "score_ppm long, label long")
    out = isotonic_fit(df, "score_ppm", "label", n_bins).collect()
    return {
        r["bin"]: (r["n"], r["pos"], r["raw_ppm"], r["fit_ppm"])
        for r in out
    }


# a classifier that is accurate but MISCALIBRATED non-monotonically:
# middling scores empirically beat high scores in one region
ROWS = []
for i in range(400):
    s = (i * 37) % 100 * 10_000  # scores 0..990000
    b = s // 100_000
    # accuracy dips at bins 6-7 (the violation PAV pools away)
    acc = [5, 10, 20, 30, 45, 60, 50, 40, 80, 95][int(b)]
    y = 1 if (i * 2654435761) % 100 < acc else 0
    ROWS.append((s, y))


def test_pav_matches_stack_sweep(spark):
    assert _run_pav(spark, ROWS, 10) == _py_pav(ROWS, 10)


def test_pav_monotone_and_pools_violation(spark):
    got = _run_pav(spark, ROWS, 10)
    fits = [got[b][3] for b in sorted(got)]
    assert fits == sorted(fits)
    raws = [got[b][2] for b in sorted(got)]
    assert raws != sorted(raws)  # the input really was non-monotone
    # pooled region shares one fitted value
    assert got[5][3] == got[6][3] == got[7][3]


def test_pav_identity_when_monotone(spark):
    rows = []
    for i in range(200):
        s = (i % 10) * 100_000 + 50_000
        y = 1 if (i * 2654435761) % 100 < (i % 10) * 10 + 5 else 0
        rows.append((s, y))
    got = _run_pav(spark, rows, 10)
    assert got == _py_pav(rows, 10)
    # weighted mean preserved exactly by PAV (up to ppm rounding)
    n_tot = sum(v[0] for v in got.values())
    pos_tot = sum(v[1] for v in got.values())
    fit_mass = sum(v[0] * v[3] for v in got.values())
    assert abs(fit_mass - pos_tot * 1_000_000) <= n_tot * len(got)


def _py_brier(rows, n_bins):
    bins: dict[int, list[int]] = {}
    for s, y in rows:
        b = _bin_of(s, n_bins)
        agg = bins.setdefault(b, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += y
        agg[2] += s
        agg[3] += (s - y * 1_000_000) ** 2 // 1_000_000
    n = sum(v[0] for v in bins.values())
    pos = sum(v[1] for v in bins.values())
    base = pos * 1_000_000 // n
    brier = sum(v[3] for v in bins.values()) // n
    rel = sum(
        v[0] * ((v[2] // v[0] - v[1] * 1_000_000 // v[0]) ** 2
                // 1_000_000)
        for v in bins.values()
    ) // n
    res = sum(
        v[0] * ((v[1] * 1_000_000 // v[0] - base) ** 2 // 1_000_000)
        for v in bins.values()
    ) // n
    unc = base * (1_000_000 - base) // 1_000_000
    return (n, base, brier, rel, res, unc, brier - (rel - res + unc))


def _run_brier(spark, rows, n_bins):
    from eget_spark.operators.calibration import brier_decomposition

    df = spark.createDataFrame(rows, "score_ppm long, label long")
    r, = brier_decomposition(df, "score_ppm", "label", n_bins).collect()
    return (r["n"], r["base_ppm"], r["brier_micro"], r["rel_micro"],
            r["res_micro"], r["unc_micro"], r["resid_micro"])


def test_brier_matches_replay(spark):
    assert _run_brier(spark, ROWS, 10) == _py_brier(ROWS, 10)


def test_brier_components_behave(spark):
    n, base, brier, rel, res, unc, resid = _run_brier(spark, ROWS, 10)
    assert 0 <= rel and 0 <= res <= unc + 1
    # a constant coin-flip forecaster: zero resolution, rel ~ 0
    flat = [(500_000, 1 if (i * 7) % 2 else 0) for i in range(200)]
    got = _run_brier(spark, flat, 10)
    assert got == _py_brier(flat, 10)
    assert got[4] == 0 and got[3] <= 1
