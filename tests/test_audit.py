"""Benford digit audit vs a pure-Python replay."""

from __future__ import annotations

from eget_spark.operators.audit import BENFORD_PPM


def _py_audit(rows):
    from collections import Counter

    by_grp: dict[str, Counter] = {}
    for g, v in rows:
        if v > 0:
            by_grp.setdefault(g, Counter())[int(str(v)[0])] += 1
    out = []
    for g in sorted(by_grp):
        c = by_grp[g]
        n = sum(c.values())
        for d in range(1, 10):
            obs = c.get(d, 0)
            exp = BENFORD_PPM[d - 1]
            dev = obs * 10**6 - n * exp
            chi2 = round((float(dev) * float(dev)) / (n * exp * 1e6), 6)
            out.append((g, d, n, obs, exp, dev, chi2))
    return out


# organic: 1..9999 ramp (roughly Benford); synthetic: all the same size
ROWS = [("organic", v) for v in (1, 2, 17, 19, 23, 104, 180, 1500, 1723,
                                 2048, 310, 46, 512, 777, 88, 913, 1066,
                                 121, 134, 15)] + [
    ("template", 4096)
] * 12 + [("zeros", 0), ("zeros", 7)]


def _run(spark, rows):
    from eget_spark.operators.audit import benford_digit_audit

    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = benford_digit_audit(df, "source", "n_chars").collect()
    return [
        (r["grp"], r["digit"], r["n"], r["obs"], r["exp_ppm"],
         r["dev_micro"], r["chi2_c"])
        for r in out
    ]


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_audit(ROWS)


def test_ppm_table_sums_to_unity(spark):
    assert sum(BENFORD_PPM) == 10**6


def test_every_digit_emitted_even_zero_obs(spark):
    out = _run(spark, ROWS)
    tmpl = [r for r in out if r[0] == "template"]
    assert [r[1] for r in tmpl] == list(range(1, 10))
    assert sum(1 for r in tmpl if r[3] == 0) == 8  # only digit 4 observed


def test_template_source_has_worse_chi2_than_organic(spark):
    out = _run(spark, ROWS)
    chi2 = {}
    for g, d, n, obs, exp, dev, c in out:
        chi2[g] = chi2.get(g, 0.0) + c
    assert chi2["template"] > chi2["organic"] * 3


def test_nonpositive_values_dropped(spark):
    out = _run(spark, ROWS)
    zeros = [r for r in out if r[0] == "zeros"]
    assert zeros and all(r[2] == 1 for r in zeros)  # n counts only the 7
