"""2-D skyline vs a brute-force Python dominance replay."""

from __future__ import annotations


def _py_skyline(rows):
    out = []
    for i, (pid, x, y) in enumerate(rows):
        dominated = any(
            (qx >= x and qy >= y and (qx > x or qy > y))
            for j, (_, qx, qy) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append((pid, x, y))
    return sorted(out, key=lambda r: (-r[1], -r[2], r[0]))


ROWS = [
    (1, 10, 90),   # frontier
    (2, 50, 50),   # frontier
    (3, 90, 10),   # frontier
    (4, 40, 40),   # dominated by 2
    (5, 10, 90),   # exact duplicate of 1: both survive
    (6, 10, 80),   # same x as 1, lower y: dominated
    (7, 90, 5),    # same x as 3, lower y: dominated
    (8, 60, 50),   # frontier (beats 2 on x, ties y)
    (9, 0, 100),   # frontier
]


def _run(spark, rows):
    from eget_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = skyline_2d(df, "id", "x", "y").collect()
    return [(r["id"], r["x"], r["y"]) for r in out]


def test_matches_brute_force(spark):
    assert _run(spark, ROWS) == _py_skyline(ROWS)


def test_tie_on_y_dominates_lower_x(spark):
    # point 8 (60, 50) dominates point 2 (50, 50): >= both, > on x
    got = {r[0] for r in _run(spark, ROWS)}
    assert 8 in got and 2 not in got


def test_exact_duplicates_both_survive(spark):
    got = {r[0] for r in _run(spark, ROWS)}
    assert {1, 5} <= got


def test_single_point_is_frontier(spark):
    assert _run(spark, [(7, 3, 3)]) == [(7, 3, 3)]


def test_monotone_chain_all_survive(spark):
    rows = [(i, i, 100 - i) for i in range(10)]
    assert _run(spark, rows) == _py_skyline(rows)
    assert len(_run(spark, rows)) == 10
