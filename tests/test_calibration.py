"""Reliability bins + ECE vs a pure-Python replay."""

from __future__ import annotations

PPM = 10**6


def _py_bins(rows, n_bins=10):
    stats: dict[int, list[int]] = {}
    for s, y in rows:
        b = min(s * n_bins // PPM, n_bins - 1)
        a = stats.setdefault(b, [0, 0, 0])
        a[0] += 1
        a[1] += y
        a[2] += s
    pre = []
    for b in sorted(stats):
        n, pos, s_sum = stats[b]
        conf = s_sum // n
        acc = pos * PPM // n
        pre.append((b, n, pos, conf, acc, abs(acc - conf)))
    tot_n = sum(r[1] for r in pre)
    ece = sum(r[1] * r[5] for r in pre) // tot_n
    return [r + (ece,) for r in pre]


ROWS = (
    # well-calibrated low bin: conf ~0.1, acc 0.1
    [(100_000, 1)] + [(100_000, 0)] * 9
    # overconfident high bin: conf ~0.9, acc 0.5
    + [(900_000, 1), (900_000, 0)] * 5
    # exact top edge folds into the last bin
    + [(PPM, 1)]
    # mid bin, perfectly calibrated at 0.5
    + [(500_000, 1), (500_000, 0)] * 3
)


def _run(spark, rows, n_bins=10):
    from eget_spark.operators.calibration import calibration_bins

    df = spark.createDataFrame(rows, "score_ppm long, label long")
    out = calibration_bins(df, "score_ppm", "label", n_bins=n_bins).collect()
    return [
        (r["bin"], r["n"], r["pos"], r["conf_ppm"], r["acc_ppm"],
         r["gap_ppm"], r["ece_ppm"])
        for r in out
    ]


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_bins(ROWS)


def test_top_edge_folds_into_last_bin(spark):
    out = _run(spark, ROWS)
    assert max(r[0] for r in out) == 9  # no bin 10 for score == 1.0


def test_perfectly_calibrated_scores_zero_ece(spark):
    # conf == acc in every bin -> every gap 0 -> ECE 0
    rows = [(250_000, 1)] + [(250_000, 0)] * 3 + [(750_000, 1)] * 3 + [
        (750_000, 0)
    ]
    out = _run(spark, rows)
    assert all(r[5] == 0 for r in out)
    assert all(r[6] == 0 for r in out)


def test_overconfident_bin_has_positive_gap(spark):
    got = {r[0]: r for r in _run(spark, ROWS)}
    assert got[9][5] > 0  # the 0.9-conf/0.5-acc bin
    assert got[1][5] == 0  # the calibrated 0.1 bin


def test_empty_bins_absent(spark):
    out = _run(spark, ROWS)
    assert [r[0] for r in out] == [1, 5, 9]
