"""KMV sketch + set ops (operators/kmv.py)."""

import hashlib

from eget_spark.operators.kmv import kmv_estimate, kmv_set_ops, kmv_sketches


def _h(v):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _members(spark, sets):
    rows = [(s, v) for s, vals in sets.items() for v in vals]
    return spark.createDataFrame(rows, "s string, v string")


def test_small_set_exact(spark):
    df = _members(spark, {"A": [f"x{i}" for i in range(10)] * 3})
    est = kmv_estimate(kmv_sketches(df, "s", "v", k=32), k=32).collect()[0]
    assert est["n_sketch"] == 10
    assert est["est_distinct"] == 10.0


def test_sketch_matches_python_min_k(spark):
    vals = [f"u{i}" for i in range(200)]
    df = _members(spark, {"A": vals})
    sk = sorted(r["h"] for r in kmv_sketches(df, "s", "v", k=16).collect())
    expect = sorted(_h(v) for v in set(vals))[:16]
    assert sk == expect


def test_estimator_reasonable_on_big_set(spark):
    vals = [f"doc{i}" for i in range(1000)]
    est = kmv_estimate(
        kmv_sketches(_members(spark, {"A": vals}), "s", "v", k=64), k=64
    ).collect()[0]["est_distinct"]
    assert 600 < est < 1600  # (k-1)/theta is unbiased, wide tolerance


def test_set_ops_identical_sets(spark):
    vals = [f"v{i}" for i in range(100)]
    sk = kmv_sketches(_members(spark, {"A": vals, "B": vals}), "s", "v", k=32)
    out = kmv_set_ops(sk, "A", "B", k=32).collect()[0]
    assert out["jaccard"] == 1.0
    assert out["matches"] == out["n_union_sketch"]


def test_set_ops_disjoint_sets(spark):
    sk = kmv_sketches(
        _members(
            spark,
            {"A": [f"a{i}" for i in range(100)], "B": [f"b{i}" for i in range(100)]},
        ),
        "s", "v", k=32,
    )
    out = kmv_set_ops(sk, "A", "B", k=32).collect()[0]
    assert out["jaccard"] == 0.0
    assert out["est_intersection"] == 0.0
