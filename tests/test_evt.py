"""PWM-GPD tail fit vs a pure-Python replay + closed-form sanity on a
synthetic Pareto-like tail."""

from __future__ import annotations

import math


def _py_gpd(values, u, m=1_000_000):
    n_total = len(values)
    e = sorted(x - u for x in values if x > u)
    n = len(e)
    b0_sum = sum(e)
    a1_num = sum((n - i) * v for i, v in enumerate(e, start=1))
    if n <= 1 or b0_sum * (n - 1) == 2 * a1_num:
        return (n_total, n, u, b0_sum, a1_num, None, None, None)
    b0 = b0_sum / n
    b1 = a1_num / (n * (n - 1))
    den = b0 - 2.0 * b1
    xi = 2.0 - b0 / den
    sigma = 2.0 * b0 * b1 / den
    zeta = n / float(n_total)
    if xi == 0.0 or m * zeta <= 0.0:
        rl = None
    else:
        rl = float(u) + (sigma / xi) * (
            math.exp(xi * math.log(m * zeta)) - 1.0
        )
        rl = int(math.copysign(math.floor(abs(rl) + 0.5), rl))
    return (n_total, n, u, b0_sum, a1_num, round(xi, 6),
            round(sigma, 6), rl)


def _values():
    vals = []
    for i in range(3000):
        x = 100 + (i * 7) % 30
        if (i * 13) % 20 == 0:
            # alpha=3 Pareto spikes (xi = 1/3, inside PWM's validity):
            # 60 * (1e6 / (1 + h))^(1/3), wide hash so truncation at
            # the support top is rarely felt
            h = (i * 48271) % 1_000_000
            x += int(round(
                60 * math.exp(math.log(1_000_000.0 / (1 + h)) / 3)
            ))
        vals.append(x)
    return vals


def _run(spark, values, u, m=1_000_000):
    from eget_spark.operators.evt import gpd_tail_fit

    df = spark.createDataFrame([(v,) for v in values], "latency long")
    r, = gpd_tail_fit(df, "latency", u, m).collect()
    return (r["n_total"], r["n_exceed"], r["threshold"], r["b0_sum"],
            r["a1_num"], r["xi"], r["sigma"], r["return_level"])


def test_matches_python_replay(spark):
    assert _run(spark, _values(), 150) == _py_gpd(_values(), 150)


def test_heavy_tail_positive_xi_extrapolates(spark):
    got = _run(spark, _values(), 150)
    n_total, n_exc, u, _, _, xi, sigma, rl = got
    # a 1/u spike law is genuinely heavy: xi > 0, sigma > 0
    assert xi > 0.2 and sigma > 0
    # the 1-in-a-million level extrapolates far beyond the sample max
    assert rl > max(_values())


def test_exponential_like_tail_small_xi(spark):
    # exponential tail sampled on its quantile grid (fine-grained so
    # discretization bias is negligible): xi should sit near 0
    n = 800
    vals = [100] * 500 + [
        100 + int(round(1000 * -math.log(1 - (i + 0.5) / n)))
        for i in range(n)
    ]
    got = _run(spark, vals, 100)
    assert got == _py_gpd(vals, 100)
    assert abs(got[5]) < 0.1  # light tail: xi near 0, far from 1/3


def test_degenerate_no_exceedances(spark):
    vals = [50] * 40
    got = _run(spark, vals, 100)
    assert got[:3] == (40, 0, 100)
    assert got[5] is None and got[7] is None


def test_constant_exceedances_null_fit(spark):
    # all exceedances equal: b0 = 2*b1 * ... degenerate den -> NULL
    vals = [100] * 10 + [120] * 5
    got = _run(spark, vals, 100)
    assert got == _py_gpd(vals, 100)
