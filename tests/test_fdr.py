"""BH-FDR over per-host failure z-tests vs a pure-Python replay.

The replay implements the literal textbook procedure (sort p ascending,
find the deepest rank i with p_(i) <= alpha*i/m, reject 1..i) and the
same A&S 7.1.26 normal tail the operator pins, so the tests pin both
the p-value quantization and the step-up decision."""

from __future__ import annotations

import math


def _phi_upper_ppm(z: float) -> int:
    x = abs(z) * 0.7071067811865476
    t = 1.0 / (1.0 + 0.3275911 * x)
    e = (
        t
        * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t
           * (-1.453152027 + t * 1.061405429))))
    ) * math.exp(-(x * x))
    tail = 0.5 * e
    p = tail if z >= 0.0 else 1.0 - tail
    return int(math.floor(1e6 * p + 0.5))


def _py_fdr(ledger, p0_ppm, alpha_ppm):
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
    k = 0
    for i, r in enumerate(rows, start=1):
        if r[4] * m <= i * alpha_ppm:
            k = i
    return {
        r[0]: (r[1], r[2], r[4], i, i <= k)
        for i, r in enumerate(rows, start=1)
    }


# 8 hosts x 50 fetches; h6/h7 fail at an elevated deterministic rate
LEDGER = [
    (
        f"h{i % 8}",
        1
        if (i * 2654435761) % 1000 < (250 if i % 8 >= 6 else 30)
        else 0,
    )
    for i in range(400)
]


def _run(spark, ledger, p0_ppm=30_000, alpha_ppm=50_000):
    from eget_spark.operators.fdr import host_failure_fdr

    df = spark.createDataFrame(ledger, "host string, fail long")
    out = host_failure_fdr(df, "host", "fail", p0_ppm, alpha_ppm)
    return {
        r["key"]: (r["n"], r["fails"], r["p_ppm"], r["rnk"],
                   r["discovery"])
        for r in out.collect()
    }


def test_matches_python_replay(spark):
    assert _run(spark, LEDGER) == _py_fdr(LEDGER, 30_000, 50_000)


def test_elevated_hosts_discovered(spark):
    got = _run(spark, LEDGER)
    assert got["h6"][4] and got["h7"][4]
    # clean hosts at the base rate survive the correction
    assert not any(got[f"h{i}"][4] for i in range(6))


def test_step_up_contiguity(spark):
    """Discoveries are exactly ranks 1..k — never a gap."""
    got = _run(spark, LEDGER)
    ranks = sorted(r for (_, _, _, r, d) in got.values() if d)
    assert ranks == list(range(1, len(ranks) + 1))


def test_no_discoveries_under_null(spark):
    """All hosts at the SLA rate: BH discovers nothing at alpha=5%."""
    null_ledger = [
        (f"h{i % 8}", 1 if (i * 2654435761) % 1000 < 30 else 0)
        for i in range(400)
    ]
    got = _run(spark, null_ledger)
    assert got == _py_fdr(null_ledger, 30_000, 50_000)
    assert not any(d for (_, _, _, _, d) in got.values())


def test_alpha_monotone(spark):
    """Raising alpha can only widen the discovery set."""
    lo = {k for k, v in _run(spark, LEDGER, alpha_ppm=10_000).items()
          if v[4]}
    hi = {k for k, v in _run(spark, LEDGER, alpha_ppm=200_000).items()
          if v[4]}
    assert lo <= hi
