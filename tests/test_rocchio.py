"""Rocchio pseudo-relevance feedback (operators/similarity.rocchio_rerank)
vs a pure-Python/NumPy replay of the pinned integer contract."""

from __future__ import annotations

import numpy as np

from eget_spark.operators.similarity import rocchio_rerank

RNG = np.random.default_rng(7)
VECS = {i: RNG.normal(size=8).astype(np.float32) for i in range(30)}


def _py_rocchio(qids, fb_k, alpha_ppm, beta_ppm, k):
    ids = sorted(VECS)
    out = {}
    for qid in qids:
        qv = VECS[qid].astype(np.float64)

        def cos(a, b):
            return round(
                float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
            )

        initial = sorted(
            ((cos(qv, VECS[i].astype(np.float64)), i) for i in ids if i != qid),
            key=lambda t: (-t[0], t[1]),
        )[:fb_k]
        fb_ids = [i for _, i in initial]
        vq_fp = np.round(qv * 1e6).astype(np.int64)
        srel = np.zeros(8, dtype=np.int64)
        for i in fb_ids:
            srel += np.round(VECS[i].astype(np.float64) * 1e6).astype(np.int64)
        q2 = (alpha_ppm * len(fb_ids) * vq_fp + beta_ppm * srel).astype(
            np.float64
        )
        rerank = sorted(
            ((cos(q2, VECS[i].astype(np.float64)), i) for i in ids if i != qid),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        out[qid] = [(i, c, r + 1) for r, (c, i) in enumerate(rerank)]
    return out


def test_rocchio_matches_python_oracle(spark):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS.items()],
        "vec_id long, embedding array<float>",
    )
    queries = df.where("vec_id % 10 = 0")
    got = {}
    for r in rocchio_rerank(df, queries, fb_k=5, k=4).collect():
        got.setdefault(r.query_id, []).append(
            (r.neighbor_id, r.cosine, r.rank)
        )
    want = _py_rocchio([0, 10, 20], fb_k=5, alpha_ppm=1_000_000,
                       beta_ppm=750_000, k=4)
    for qid in want:
        assert sorted(got[qid], key=lambda t: t[2]) == want[qid], qid


def test_rocchio_beta_zero_recovers_initial_ranking(spark):
    """With beta=0 the modified query is a positive scalar multiple of
    the original, so the re-rank equals the plain brute-force top-k."""
    from eget_spark.operators.similarity import cosine_topk_bruteforce

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS.items()],
        "vec_id long, embedding array<float>",
    )
    queries = df.where("vec_id = 3")
    base = {
        (r.neighbor_id, r.rank)
        for r in cosine_topk_bruteforce(df, queries, k=5).collect()
    }
    got = {
        (r.neighbor_id, r.rank)
        for r in rocchio_rerank(df, queries, fb_k=5, beta_ppm=0, k=5).collect()
    }
    assert got == base


def test_rocchio_moves_toward_feedback_cluster(spark):
    """A query sitting between two tight clusters, with feedback drawn
    from its nearest neighbors (cluster A), must re-rank cluster A
    above cluster B."""
    a = [[10.0, 0.1 * i, 0.0] for i in range(4)]      # cluster A: ids 0-3
    b = [[0.0, 0.1 * i, 10.0] for i in range(4)]      # cluster B: ids 4-7
    # query leans slightly toward A
    rows = [(i, v) for i, v in enumerate(a + b)] + [(99, [7.0, 0.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.where("vec_id = 99")
    got = [
        r.neighbor_id
        for r in rocchio_rerank(df, queries, fb_k=3, k=8)
        .orderBy("rank")
        .collect()
    ]
    assert set(got[:4]) == {0, 1, 2, 3}
