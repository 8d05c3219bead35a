"""Horvitz-Thompson estimation vs a pure-Python replay + unbiasedness
sanity against the known full-population total."""

from __future__ import annotations

import math


def _py_ht(rows):
    n = 0
    st = ht = vs = 0
    for y, pi in rows:
        if not 0 < pi <= 1_000_000:
            continue
        n += 1
        st += y
        w = y * 1_000_000 // pi
        ht += w
        vs += w * (1_000_000 - pi) // 1_000_000 * w
    se = int(math.floor(math.sqrt(float(vs)) + 0.5))
    return (n, st, ht, vs, se)


def _population():
    """1000 units; value = size; rare big units sampled at 20%, the
    long tail at 2% — the unequal-probability design HT exists for."""
    pop = []
    for i in range(1000):
        big = i % 50 == 0
        y = 500 + (i * 7) % 90 if big else 10 + (i * 13) % 20
        pi = 200_000 if big else 20_000
        pop.append((i, y, pi))
    return pop


def _sampled(pop):
    return [
        (y, pi)
        for i, y, pi in pop
        if (i * 2654435761) % 1_000_000 < pi
    ]


def _run(spark, rows):
    from eget_spark.operators.sampling import ht_estimate

    df = spark.createDataFrame(rows, "y long, pi_ppm long")
    r, = ht_estimate(df, "y", "pi_ppm").collect()
    return (r["n_sample"], r["sample_total"], r["ht_total"], r["var_sum"],
            r["se"])


def test_matches_python_replay(spark):
    rows = _sampled(_population())
    assert _run(spark, rows) == _py_ht(rows)


def test_estimate_near_truth_within_se(spark):
    pop = _population()
    truth = sum(y for _, y, _ in pop)
    n, st, ht, vs, se = _run(spark, _sampled(pop))
    # the raw sample total is nowhere near the population total…
    assert st < truth // 2
    # …the HT expansion is, within 3 standard errors
    assert abs(ht - truth) <= 3 * se
    assert se > 0


def test_full_census_exact_zero_variance(spark):
    rows = [(y, 1_000_000) for y in (5, 7, 11)]
    assert _run(spark, rows) == (3, 23, 23, 0, 0)


def test_invalid_pi_rows_excluded(spark):
    rows = [(10, 500_000), (99, 0), (99, 2_000_000)]
    got = _run(spark, rows)
    assert got == _py_ht(rows)
    assert got[0] == 1 and got[2] == 20
