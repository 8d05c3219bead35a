"""UCB1 scoring vs a pure-Python replay."""

from __future__ import annotations

import math


def _py_ucb(rows, k=20):
    stats: dict[str, list[int]] = {}
    for arm, r in rows:
        a = stats.setdefault(arm, [0, 0])
        a[0] += 1
        a[1] += r
    n = sum(v[0] for v in stats.values())
    out = []
    for arm, (pulls, wins) in stats.items():
        mean = (wins * 10**6) // pulls
        bonus = round(math.sqrt(2 * math.log(n) / pulls) * 1e6)
        out.append((arm, pulls, wins, mean, bonus, mean + bonus))
    out.sort(key=lambda r: (-r[5], r[0]))
    return out[:k]


ROWS = (
    [("rich", 1)] * 8 + [("rich", 0)] * 2
    + [("poor", 0)] * 10
    + [("fresh", 1)]          # one pull, perfect reward: huge bonus
    + [("even", 1), ("even", 0)] * 5
)


def _run(spark, rows, k=20):
    from eget_spark.operators.bandit import ucb1_scores

    df = spark.createDataFrame(rows, "host string, reward long")
    out = ucb1_scores(df, "host", "reward", k=k).collect()
    return [
        (r["arm"], r["pulls"], r["wins"], r["mean_micro"], r["bonus_micro"],
         r["ucb_micro"])
        for r in out
    ]


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_ucb(ROWS)


def test_underexplored_arm_wins(spark):
    out = _run(spark, ROWS)
    # the single-pull arm gets the optimism bonus and schedules first
    assert out[0][0] == "fresh"


def test_exploitation_orders_equal_pulls(spark):
    got = {r[0]: r for r in _run(spark, ROWS)}
    assert got["rich"][5] > got["even"][5] > got["poor"][5]


def test_top_k_truncates(spark):
    assert len(_run(spark, ROWS, k=2)) == 2
