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


def test_ivf_pq_topk_matches_python_adc_oracle(spark):
    """Full python oracle: fixed-point vectors, trained codebooks (via
    train_codebooks), floor-div cell centroids, integer routing + ADC,
    pinned tie orders — compared row-for-row against ivf_pq_topk."""
    from eget_spark.operators.kmeans import vec_fp
    from eget_spark.operators.pq import ivf_pq_topk, pq_codes, train_codebooks
    from pyspark.sql import functions as F

    m, k_codes, n_iter, k, nprobe, dim = 2, 2, 2, 3, 1, 8
    rows = []
    for i in range(16):
        base = 0.0 if i % 2 == 0 else 100.0
        rows.append((i, i % 2, [base + ((i * 7 + j * 3) % 11) / 10.0 for j in range(dim)]))
    # exact duplicate of vector 0 as id 16 (same cell 0)
    rows.append((16, 0, list(rows[0][2])))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_fp"])
        for r in ivf_pq_topk(
            df, df.where(F.col("vec_id").isin(0, 3)), "label",
            "vec_id", "embedding", m, k_codes, n_iter, k, nprobe,
        ).collect()
    }

    # python oracle ------------------------------------------------------
    fp_df = df.select(
        F.col("vec_id").alias("id"), vec_fp(F.col("embedding")).alias("vfp")
    )
    fps = {r["id"]: list(r["vfp"]) for r in fp_df.collect()}
    d_sub = dim // m
    cents = train_codebooks(fp_df, m, k_codes, n_iter, d_sub)
    codes = {
        r["id"]: [r[f"code_{j}"] for j in range(m)]
        for r in pq_codes(df, "vec_id", "embedding", m, k_codes, n_iter).collect()
    }
    cells = {i: lab for i, lab, _ in rows}
    # floor-div integer centroids per cell
    ccent = {}
    for lab in {0, 1}:
        members = [fps[i] for i in fps if cells[i] == lab]
        ccent[lab] = [
            sum(v[p] for v in members) // len(members) for p in range(dim)
        ]
    want = {}
    for q in (0, 3):
        qfp = fps[q]
        routed = sorted(
            ((sum((qfp[p] - c[p]) ** 2 for p in range(dim)), lab)
             for lab, c in ccent.items())
        )[:nprobe]
        probe = {lab for _, lab in routed}
        dt = [
            [sum((qfp[j * d_sub + p] - cent[p]) ** 2 for p in range(d_sub))
             for cent in cents[j]]
            for j in range(m)
        ]
        cand = sorted(
            (sum(dt[j][codes[i][j]] for j in range(m)), i)
            for i in fps
            if i != q and cells[i] in probe
        )[:k]
        for rank, (adc, i) in enumerate(cand, 1):
            want[(q, rank)] = (i, adc)
    assert got == want
    # the rank-1 ADC for query 0 is the floor — query 0's own quantization
    # distortion (its exact duplicate id 16 shares its codes; with k=2
    # codewords other same-code neighbors tie and id-asc picks the lowest)
    q0fp = fps[0]
    dt0 = [
        [sum((q0fp[j * d_sub + p] - cent[p]) ** 2 for p in range(d_sub))
         for cent in cents[j]]
        for j in range(m)
    ]
    assert got[(0, 1)][1] == sum(min(dt0[j]) for j in range(m))
    assert codes[got[(0, 1)][0]] == codes[0] == codes[16]


def test_driver_training_matches_distributed(spark):
    """Round 6: sub-threshold training runs on the driver in numpy.
    The codebooks (and therefore every code) must be bit-identical to
    the forced distributed Lloyd loop."""
    import random

    from pyspark.sql import functions as F

    from eget_spark.operators.kmeans import vec_fp
    from eget_spark.operators.pq import train_codebooks

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(8)]) for i in range(300)
    ]
    fp = (
        _emb(spark, rows)
        .select("id", vec_fp(F.col("vec")).alias("vfp"))
        .repartition(8, "id")
        .persist()
    )
    fp.count()
    a = train_codebooks(fp, m=2, k=4, n_iter=3, d_sub=4)
    b = train_codebooks(
        fp, m=2, k=4, n_iter=3, d_sub=4, driver_train_elems=0
    )
    assert a == b
    fp.unpersist()
