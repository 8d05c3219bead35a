"""Fixed-point Lloyd k-means (operators/kmeans.py) vs a pure-Python oracle."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from eget_spark.operators.kmeans import FP_SCALE, _best, kmeans_fp, vec_fp


def _py_kmeans(rows, k, n_iter):
    """rows: [(id, [float...])] -> {id: (cluster, dist_fp)} under the
    pinned fixed-point semantics."""
    fp = [(i, [math.floor(x * FP_SCALE + 0.5) for x in v]) for i, v in rows]
    init = sorted(fp, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))[:k]
    cents = [v for _, v in init]

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for _ in range(n_iter):
        assign = {
            i: min((dist(v, c), ci) for ci, c in enumerate(cents))[1] for i, v in fp
        }
        nxt = []
        for ci in range(k):
            mem = [v for i, v in fp if assign[i] == ci]
            nxt.append(
                cents[ci]
                if not mem
                else [math.floor(sum(col) / len(mem)) for col in zip(*mem)]
            )
        cents = nxt
    return {
        i: min((dist(v, c), ci) for ci, c in enumerate(cents))[::-1] for i, v in fp
    }


def _rows(n, dim=8):
    # deterministic spread: two loose blobs plus stragglers
    out = []
    for i in range(n):
        base = 0.4 if i % 2 else -0.4
        out.append(
            (i, [base + ((i * 31 + d * 17) % 97 - 48) / 300.0 for d in range(dim)])
        )
    return out


def test_kmeans_matches_python_oracle(spark):
    rows = _rows(60)
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "id long, vec array<float>"
    )
    got = {
        r["id"]: (r["cluster"], r["dist_fp"])
        for r in kmeans_fp(df, "id", "vec", k=3, n_iter=2).collect()
    }
    assert got == _py_kmeans(rows, 3, 2)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # 3 identical points, k=3: after step 1 all collapse onto one cell;
    # the empty cells must keep their init centroid, not crash/NaN
    rows = [(0, [0.1, 0.1]), (1, [0.1, 0.1]), (2, [0.1, 0.1])]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out = kmeans_fp(df, "id", "vec", k=3, n_iter=2).collect()
    assert len(out) == 3
    assert len({r["cluster"] for r in out}) == 1
    assert all(r["dist_fp"] == 0 for r in out)


def test_kmeans_assignment_is_zero_shuffle(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in _rows(40)], "id long, vec array<float>"
    )
    fp = df.select(F.col("id"), vec_fp(F.col("vec")).alias("vfp"))
    cents = [[0] * 8, [100000] * 8]
    plan = (
        fp.select("id", _best(cents)["cidx"].alias("cluster"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # centroid literals ride inside the projection: no Exchange, no Python
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_kmeans_clusters_separate_blobs(spark):
    # two tight far-apart blobs, k=2 -> the partition is exactly the blobs
    rows = [(i, [0.3 + i * 1e-4, 0.3]) for i in range(10)] + [
        (100 + i, [-0.3 - i * 1e-4, -0.3]) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out = kmeans_fp(df, "id", "vec", k=2, n_iter=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["id"])
    assert sorted(len(v) for v in by_cluster.values()) == [10, 10]
    groups = sorted(by_cluster.values(), key=lambda s: min(s))
    assert groups[0] == set(range(10))


def test_kmeans_k_exceeding_rows_raises_cleanly(spark):
    import pytest

    from eget_spark.operators.kmeans import kmeans_fp

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)], "id long, vec array<float>"
    )
    with pytest.raises(ValueError, match="exceeds the 3 input rows"):
        kmeans_fp(df, "id", "vec", k=4, n_iter=1)


def test_driver_training_matches_distributed(spark):
    """Round 6: sub-threshold k-means trains on the driver in numpy.
    Assignments must be bit-identical to the forced distributed loop."""
    import random

    import eget_spark.operators.pq as pq
    from eget_spark.operators.kmeans import kmeans_fp

    rng = random.Random(9)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(6)]) for i in range(250)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(
        map(tuple, kmeans_fp(df, "vec_id", "embedding", k=5, n_iter=3).collect())
    )
    old = pq.PQ_DRIVER_TRAIN_ELEMS
    pq.PQ_DRIVER_TRAIN_ELEMS = 0  # force the distributed loop
    try:
        b = sorted(
            map(
                tuple,
                kmeans_fp(df, "vec_id", "embedding", k=5, n_iter=3).collect(),
            )
        )
    finally:
        pq.PQ_DRIVER_TRAIN_ELEMS = old
    assert a == b
