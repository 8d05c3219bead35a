"""Exact quantiles (operators/quantiles.py)."""

from fractions import Fraction

from eget_spark.operators.quantiles import exact_quantiles


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, id long")


def test_pinned_rank_semantics(spark):
    # n=4: p50 rank ceil(2)=2, p90 rank ceil(3.6)=4, p99 rank 4
    rows = [("a", v, i) for i, v in enumerate([10, 20, 30, 40])]
    out = exact_quantiles(_df(spark, rows), "k", "v", "id").collect()[0]
    assert (out["q_1_2"], out["q_9_10"], out["q_99_100"]) == (20, 40, 40)
    assert out["n"] == 4


def test_single_row_key(spark):
    out = exact_quantiles(_df(spark, [("a", 7, 0)]), "k", "v", "id").collect()[0]
    assert (out["q_1_2"], out["q_9_10"], out["q_99_100"]) == (7, 7, 7)


def test_python_oracle_multi_key(spark):
    import math

    rows = [(f"k{i % 3}", (i * 37) % 101, i) for i in range(90)]
    out = {r["key"]: r.asDict() for r in exact_quantiles(
        _df(spark, rows), "k", "v", "id").collect()}
    for key in ("k0", "k1", "k2"):
        vals = sorted((v, i) for (kk, v, i) in rows if kk == key)
        n = len(vals)
        for p, col in ((0.5, "q_1_2"), (0.9, "q_9_10"), (0.99, "q_99_100")):
            assert out[key][col] == vals[math.ceil(p * n) - 1][0], (key, p)


def test_custom_fractions(spark):
    rows = [("a", v, v) for v in range(1, 11)]
    out = exact_quantiles(
        _df(spark, rows), "k", "v", "id", ps=(Fraction(1, 4),)
    ).collect()[0]
    assert out["q_1_4"] == 3  # ceil(10/4) = 3rd smallest
