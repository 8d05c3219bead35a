"""Mann-Kendall + Theil-Sen vs a pure-Python replay."""

from __future__ import annotations


def _trunc_div(a, b):
    # int64 DIV: truncation toward zero (Spark DIV == DuckDB //)
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _py_trend(rows, max_points=40):
    by_key: dict[str, list[tuple[int, int]]] = {}
    for k, t, v in rows:
        by_key.setdefault(k, []).append((t, v))
    out = {}
    for k, pts in by_key.items():
        pts.sort()
        pts = pts[:max_points]
        slopes, s = [], 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (ti, vi), (tj, vj) = pts[i], pts[j]
                d = vj - vi
                s += (d > 0) - (d < 0)
                slopes.append((_trunc_div(d * 10**6, tj - ti), ti, tj))
        slopes.sort()
        np_ = len(slopes)
        if np_:
            sen = (slopes[(np_ + 1) // 2 - 1][0]
                   + slopes[(np_ + 2) // 2 - 1][0])
        else:
            sen = None
        trend = "up" if s > 0 else ("down" if s < 0 else "flat")
        out[k] = (len(pts), np_, s, sen, trend)
    return out


ROWS = (
    # clean upward ramp
    [("up", t, 100 + 5 * t) for t in range(10)]
    # downward with one wild outlier Theil-Sen must shrug off
    + [("down", t, 500 - 7 * t) for t in range(10)]
    + [("down", 10, 9000)]
    # flat: constant value, every pair sign 0
    + [("flat", t, 200) for t in range(8)]
    # single point: no pairs
    + [("lone", 0, 42)]
)


def _run(spark, rows, max_points=40):
    from eget_spark.operators.trend import trend_tests

    df = spark.createDataFrame(rows, "host string, ts long, value long")
    out = trend_tests(df, "host", "ts", "value", max_points=max_points)
    return {
        r["key"]: (r["n_points"], r["n_pairs"], r["mk_s"], r["sen_x2_ppm"],
                   r["trend"])
        for r in out.collect()
    }


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_trend(ROWS)


def test_directions(spark):
    got = _run(spark, ROWS)
    assert got["up"][4] == "up" and got["down"][4] == "down"
    assert got["flat"][4] == "flat"
    assert got["lone"] == (1, 0, 0, None, "flat")


def test_sen_robust_to_outlier(spark):
    # the 9000 outlier shifts the mean slope wildly; the median stays -7
    got = _run(spark, ROWS)
    assert got["down"][3] == 2 * (-7 * 10**6)


def test_exact_slope_on_clean_ramp(spark):
    got = _run(spark, ROWS)
    assert got["up"][3] == 2 * (5 * 10**6)
    assert got["up"][2] == 45  # all 45 pairs increasing


def test_point_cap_bounds_pairs(spark):
    got = _run(spark, ROWS, max_points=5)
    assert got == _py_trend(ROWS, max_points=5)
    assert got["up"][1] == 10  # 5 choose 2
