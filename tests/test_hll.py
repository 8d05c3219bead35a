"""HyperLogLog sketch (operators/hll.py) vs a pure-Python register oracle."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from eget_spark.operators.hll import HASH_BITS, hll_estimate, hll_registers


def _py_registers(values, p=8):
    m = 1 << p
    width = HASH_BITS - p
    regs = [0] * m
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        bucket = h & (m - 1)
        w = h >> p
        rho = (width - w.bit_length()) + 1  # w=0 -> width+1
        regs[bucket] = max(regs[bucket], rho)
    return regs


def _vals(n, salt=""):
    return [f"v{salt}:{i}" for i in range(n)]


def test_registers_bit_exact_vs_python(spark):
    vals = _vals(3000)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["bucket"]: r["reg"]
        for r in hll_registers(df, F.col("v"), p=8).collect()
    }
    expect = _py_registers(vals)
    assert got == {i: r for i, r in enumerate(expect)}
    assert len(got) == 256  # empty buckets materialized as reg=0


def test_estimate_within_hll_error_bounds(spark):
    # sigma ~= 1.04/sqrt(256) = 6.5%; 3 sigma ~= 20%
    n = 5000
    df = spark.createDataFrame([(v,) for v in _vals(n)], "v string")
    est = hll_estimate(df, F.col("v"), p=8).collect()[0]["estimate"]
    assert abs(est - n) / n < 0.20


def test_small_range_linear_counting(spark):
    n = 40  # far below 2.5 m -> linear-counting branch
    df = spark.createDataFrame([(v,) for v in _vals(n, "s")], "v string")
    row = hll_estimate(df, F.col("v"), p=8).collect()[0]
    assert row["v_zero"] > 0
    assert abs(row["estimate"] - n) / n < 0.25


def test_duplicates_do_not_move_registers(spark):
    vals = _vals(500)
    df1 = spark.createDataFrame([(v,) for v in vals], "v string")
    df3 = spark.createDataFrame([(v,) for v in vals * 3], "v string")
    r1 = sorted(map(tuple, hll_registers(df1, F.col("v")).collect()))
    r3 = sorted(map(tuple, hll_registers(df3, F.col("v")).collect()))
    assert r1 == r3


def test_merge_is_registerwise_max(spark):
    a = _vals(800, "a")
    b = _vals(800, "b")
    da = spark.createDataFrame([(v,) for v in a], "v string")
    db = spark.createDataFrame([(v,) for v in b], "v string")
    ra = {r["bucket"]: r["reg"] for r in hll_registers(da, F.col("v")).collect()}
    rb = {r["bucket"]: r["reg"] for r in hll_registers(db, F.col("v")).collect()}
    runion = {
        r["bucket"]: r["reg"]
        for r in hll_registers(da.unionAll(db), F.col("v")).collect()
    }
    assert runion == {k: max(ra[k], rb[k]) for k in ra}


def test_sketch_agg_is_map_side_combined(spark):
    df = spark.createDataFrame([(v,) for v in _vals(1000)], "v string").repartition(8)
    plan = (
        hll_registers(df, F.col("v"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial aggregate before the exchange: each task ships <= m rows
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("p", [4, 8, 12])
def test_register_count_tracks_p(spark, p):
    df = spark.createDataFrame([(v,) for v in _vals(100)], "v string")
    assert hll_registers(df, F.col("v"), p=p).count() == (1 << p)


def test_hll_estimate_by_matches_global_per_key(spark):
    """Keyed sketch == global sketch run on each key's slice."""
    import pyspark.sql.functions as F

    from eget_spark.operators.hll import hll_estimate, hll_estimate_by

    rows = [(f"k{i % 3}", f"v{(i * 7) % 40}") for i in range(200)]
    df = spark.createDataFrame(rows, "key string, val string")
    keyed = {
        r["key"]: (r["m"], r["v_zero"], r["sum_scaled"], r["estimate"])
        for r in hll_estimate_by(df, "key", F.col("val"), p=8).collect()
    }
    for k in ("k0", "k1", "k2"):
        g = hll_estimate(
            df.where(F.col("key") == k), F.col("val"), p=8
        ).first()
        assert keyed[k] == (g["m"], g["v_zero"], g["sum_scaled"], g["estimate"])


def test_hll_estimate_by_small_range_accuracy(spark):
    """Linear-counting branch: estimates within a few % of exact."""
    import pyspark.sql.functions as F

    from eget_spark.operators.hll import hll_estimate_by

    rows = [("a", f"x{i}") for i in range(50)] + [("b", "x0")] * 30
    df = spark.createDataFrame(rows, "key string, val string")
    got = {
        r["key"]: r["estimate"]
        for r in hll_estimate_by(df, "key", F.col("val"), p=8).collect()
    }
    assert abs(got["a"] - 50) / 50 < 0.15
    assert abs(got["b"] - 1) < 0.2
