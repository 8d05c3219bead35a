"""Bradley-Terry MM fixed point vs a pure-Python integer replay."""

from __future__ import annotations

SCALE = 10**6
SQ = SCALE * SCALE


def _py_wins(rows):
    """rows = [(item, value)] -> {(a, b): strict-greater pair count}."""
    wins: dict[tuple[str, str], int] = {}
    for ia, va in rows:
        for ib, vb in rows:
            if ia != ib and va > vb:
                wins[(ia, ib)] = wins.get((ia, ib), 0) + 1
    return wins


def _py_bt(wins, items, n_rounds=3):
    pairs: dict[tuple[str, str], list[int]] = {}
    for (a, b), w in wins.items():
        pairs.setdefault((a, b), [0, 0])[0] += w
        pairs.setdefault((a, b), [0, 0])[1] += w
        pairs.setdefault((b, a), [0, 0])[1] += w
    w_tot = {i: 0 for i in items}
    n_tot = {i: 0 for i in items}
    for (a, _b), (w, n) in pairs.items():
        w_tot[a] += w
        n_tot[a] += n
    s = len(items)
    p = {i: SCALE for i in items}
    for _ in range(n_rounds):
        denom = {i: 0 for i in items}
        for (a, b), (_w, n) in pairs.items():
            denom[a] += (n * SQ) // max(p[a] + p[b], 1)
        raw = {i: (w_tot[i] * SQ) // max(denom[i], 1) for i in items}
        tot = sum(raw.values())
        p = {i: (raw[i] * (s * SCALE)) // max(tot, 1) for i in items}
    out = [(i, w_tot[i], n_tot[i], p[i]) for i in items]
    out.sort(key=lambda r: (-r[3], r[0]))
    return out


ROWS = [
    ("gold", 90), ("gold", 80), ("gold", 85), ("gold", 60),
    ("mid", 55), ("mid", 60), ("mid", 70), ("mid", 40),
    ("weak", 20), ("weak", 30), ("weak", 60), ("weak", 10),
]


def _run(spark, rows, n_rounds=3):
    from eget_spark.operators.preference import (
        bradley_terry_fixed,
        pairwise_wins_by_value,
    )

    df = spark.createDataFrame(rows, "item string, v long")
    wins = pairwise_wins_by_value(df, "item", "v")
    items = df.select("item").distinct()
    out = bradley_terry_fixed(wins, items, n_rounds=n_rounds).collect()
    return [(r["item"], r["wins"], r["comparisons"], r["bt_fp"]) for r in out]


def test_wins_match_quadratic_oracle(spark):
    from eget_spark.operators.preference import pairwise_wins_by_value

    df = spark.createDataFrame(ROWS, "item string, v long")
    got = {
        (r["a"], r["b"]): r["wins"]
        for r in pairwise_wins_by_value(df, "item", "v").collect()
    }
    assert got == _py_wins(ROWS)


def test_bt_matches_python_replay(spark):
    items = sorted({i for i, _ in ROWS})
    assert _run(spark, ROWS) == _py_bt(_py_wins(ROWS), items)


def test_dominant_item_ranks_first(spark):
    out = _run(spark, ROWS)
    assert out[0][0] == "gold" and out[-1][0] == "weak"
    assert out[0][3] > out[1][3] > out[2][3]


def test_symmetric_items_tie(spark):
    rows = [("a", 1), ("a", 3), ("b", 1), ("b", 3)]
    out = _run(spark, rows)
    assert out[0][3] == out[1][3]


def test_never_compared_item_keeps_default(spark):
    from eget_spark.operators.preference import bradley_terry_fixed

    wins = spark.createDataFrame([("a", "b", 4)], "a string, b string, wins long")
    items = spark.createDataFrame([("a",), ("b",), ("c",)], "item string")
    out = {r["item"]: r for r in bradley_terry_fixed(wins, items).collect()}
    assert out["c"]["comparisons"] == 0
    assert out["a"]["bt_fp"] > out["b"]["bt_fp"]
