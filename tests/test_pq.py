"""Product quantization (operators/pq.py)."""

import pytest

from eget_spark.operators.pq import pq_codes


def _emb(spark, rows, dim=8):
    return spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in rows],
        f"id long, vec array<float>",
    )


def test_codes_shape_and_range(spark):
    rows = [(i, [((i * 7 + j * 3) % 11) / 10.0 for j in range(8)]) for i in range(12)]
    out = pq_codes(_emb(spark, rows), "id", "vec", m=2, k=3, n_iter=1)
    got = out.collect()
    assert len(got) == 12
    assert set(out.columns) == {"id", "code_0", "code_1", "dist_fp"}
    for r in got:
        assert 0 <= r["code_0"] < 3 and 0 <= r["code_1"] < 3
        assert r["dist_fp"] >= 0


def test_identical_vectors_share_codes_zero_distortion(spark):
    # 4 copies of each of 2 distinct vectors, k=2 per subspace: every
    # vector IS a codeword after one Lloyd step -> distortion 0
    rows = [(i, [1.0] * 4 + [0.0] * 4 if i % 2 else [0.0] * 4 + [1.0] * 4)
            for i in range(8)]
    out = {r["id"]: r for r in pq_codes(
        _emb(spark, rows), "id", "vec", m=2, k=2, n_iter=2).collect()}
    for i in range(8):
        assert out[i]["dist_fp"] == 0
    evens = {(out[i]["code_0"], out[i]["code_1"]) for i in range(0, 8, 2)}
    odds = {(out[i]["code_0"], out[i]["code_1"]) for i in range(1, 8, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_dim_must_divide(spark):
    with pytest.raises(ValueError):
        pq_codes(_emb(spark, [(1, [0.0] * 8)]), "id", "vec", m=3).collect()


def test_deterministic_across_partitionings(spark):
    rows = [(i, [((i * 13 + j) % 17) / 16.0 for j in range(8)]) for i in range(20)]
    a = pq_codes(_emb(spark, rows).repartition(1), "id", "vec", m=4, k=3, n_iter=2)
    b = pq_codes(_emb(spark, rows).repartition(7), "id", "vec", m=4, k=3, n_iter=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
