"""Beta-binomial empirical-Bayes shrinkage vs a pure-Python replay."""

from __future__ import annotations

import math


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _py_shrink(ledger):
    per: dict[str, list[int]] = {}
    for key, s in ledger:
        agg = per.setdefault(key, [0, 0])
        agg[0] += 1
        agg[1] += s
    keys = sorted(per)
    k = len(keys)
    pm = {key: per[key][1] * 1000 // per[key][0] for key in keys}
    sum_p = sum(pm.values())
    sum_p2 = sum(v * v for v in pm.values())
    varnum = float(k) * float(sum_p2) - float(sum_p) * float(sum_p)
    m = float(sum_p) / float(k)
    out = {}
    for key in keys:
        n, x = per[key]
        raw = x * 1_000_000 // n
        if varnum == 0.0:
            out[key] = (n, x, raw, _round_half_away(1000.0 * m),
                        None, None)
            continue
        v = varnum / (float(k) * float(k))
        nu = (m * (1000.0 - m)) / v - 1.0
        if nu <= 0.0:
            out[key] = (n, x, raw, raw, None, None)
            continue
        a = (m / 1000.0) * nu
        b = ((1000.0 - m) / 1000.0) * nu
        shrunk = _round_half_away(
            1e6 * (float(x) + a) / (float(n) + a + b)
        )
        out[key] = (n, x, raw, shrunk, _round_half_away(1e6 * a),
                    _round_half_away(1e6 * b))
    return out


LEDGER = (
    # a fleet with a common ~60% rate and assorted sample sizes,
    # including the misleading small-n extremes shrinkage exists for
    [("big", 1 if (i * 7) % 10 < 6 else 0) for i in range(200)]
    + [("mid", 1 if (i * 3) % 10 < 7 else 0) for i in range(40)]
    + [("lucky", 1)] * 3          # 3/3 raw
    + [("unlucky", 0)] * 4        # 0/4 raw
    + [("half", 1), ("half", 0)] * 5
)


def _run(spark, ledger):
    from eget_spark.operators.shrinkage import beta_binomial_shrink

    df = spark.createDataFrame(ledger, "host string, success long")
    out = beta_binomial_shrink(df, "host", "success").collect()
    return {
        r["key"]: (r["n"], r["successes"], r["raw_ppm"], r["shrunk_ppm"],
                   r["prior_alpha_micro"], r["prior_beta_micro"])
        for r in out
    }


def test_matches_python_replay(spark):
    assert _run(spark, LEDGER) == _py_shrink(LEDGER)


def test_shrinkage_direction(spark):
    got = _run(spark, LEDGER)
    # the 3/3 host is pulled DOWN toward the fleet, 0/4 pulled UP
    assert got["lucky"][3] < got["lucky"][2]
    assert got["unlucky"][3] > got["unlucky"][2]
    # the large-sample host barely moves (< 2% of its raw rate)
    big_raw, big_shrunk = got["big"][2], got["big"][3]
    assert abs(big_shrunk - big_raw) < big_raw * 2 // 100
    # small-n hosts move much more than the big one, relatively
    assert abs(got["lucky"][3] - got["lucky"][2]) > abs(
        big_shrunk - big_raw
    )


def test_zero_variance_pins_to_mean(spark):
    ledger = [(f"h{i}", s) for i in range(5) for s in (1, 1, 0, 0)]
    got = _run(spark, ledger)
    assert got == _py_shrink(ledger)
    assert all(v[3] == 500_000 and v[4] is None for v in got.values())


def test_mom_failure_is_noop(spark):
    # rates piled at the extremes: spread exceeds any Beta -> no-op
    ledger = [("a", 1)] * 4 + [("b", 0)] * 4 + [("c", 1)] * 3 + [
        ("d", 0)
    ] * 3
    got = _run(spark, ledger)
    assert got == _py_shrink(ledger)
    assert all(v[3] == v[2] and v[4] is None for v in got.values())
