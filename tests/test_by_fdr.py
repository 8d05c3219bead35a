"""Benjamini-Yekutieli step-up vs a pure-Python replay + the
BY-is-more-conservative-than-BH containment guarantee."""

from __future__ import annotations

import math

from tests.test_fdr import LEDGER, _phi_upper_ppm


def _py_by(ledger, p0_ppm, alpha_ppm):
    per: dict[str, list[int]] = {}
    for host, fail in ledger:
        agg = per.setdefault(host, [0, 0])
        agg[0] += 1
        agg[1] += fail
    rows = []
    for host, (n, x) in per.items():
        num = float(x * 1_000_000 - n * p0_ppm)
        den = math.sqrt(float(n) * (p0_ppm * (1_000_000 - p0_ppm)))
        z = num / den
        rows.append((host, n, x, z, _phi_upper_ppm(z)))
    rows.sort(key=lambda r: (r[4], r[0]))
    m = len(rows)
    acc = 0.0
    for j in range(1, m + 1):
        acc += 1.0 / j
    h_micro = int(math.floor(1e6 * acc + 0.5))
    k = 0
    for i, r in enumerate(rows, start=1):
        if r[4] * m * h_micro <= i * alpha_ppm * 1_000_000:
            k = i
    return {
        r[0]: (r[1], r[2], r[4], i, i <= k)
        for i, r in enumerate(rows, start=1)
    }


def _run_by(spark, ledger, p0_ppm=30_000, alpha_ppm=50_000):
    from eget_spark.operators.fdr import host_failure_fdr_by

    df = spark.createDataFrame(ledger, "host string, fail long")
    out = host_failure_fdr_by(df, "host", "fail", p0_ppm, alpha_ppm)
    return {
        r["key"]: (r["n"], r["fails"], r["p_ppm"], r["rnk"],
                   r["discovery"])
        for r in out.collect()
    }


def test_matches_python_replay(spark):
    assert _run_by(spark, LEDGER) == _py_by(LEDGER, 30_000, 50_000)


def test_by_contained_in_bh(spark):
    """BY's harmonic shrinkage can only REMOVE discoveries vs BH."""
    from eget_spark.operators.fdr import host_failure_fdr

    df = spark.createDataFrame(LEDGER, "host string, fail long")
    bh = {
        r["key"]
        for r in host_failure_fdr(df, "host", "fail").collect()
        if r["discovery"]
    }
    by = {k for k, v in _run_by(spark, LEDGER).items() if v[4]}
    assert by <= bh
    # the strongly-elevated hosts survive even the conservative screen
    assert {"h6", "h7"} <= by


def test_null_ledger_no_discoveries(spark):
    null_ledger = [
        (f"h{i % 8}", 1 if (i * 2654435761) % 1000 < 30 else 0)
        for i in range(400)
    ]
    got = _run_by(spark, null_ledger)
    assert got == _py_by(null_ledger, 30_000, 50_000)
    assert not any(d for (_, _, _, _, d) in got.values())
