"""Rocchio pseudo-relevance feedback (operators/similarity.rocchio_rerank)
vs a pure-Python/NumPy replay of the pinned integer contract."""

from __future__ import annotations

import numpy as np

from eget_spark.operators.similarity import mmr_rerank, rocchio_rerank

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


def _py_mmr(vecs, qid, n_cand, k, lam=0.5):
    ids = sorted(vecs)

    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    qv = vecs[qid].astype(np.float64)
    cand = sorted(
        ((cos(qv, vecs[i].astype(np.float64)), i) for i in ids if i != qid),
        key=lambda t: (-t[0], t[1]),
    )[:n_cand]
    rel = {i: r for r, i in cand}
    sel = []
    first = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    sel.append((1, first[0], first[1], first[1]))
    while len(sel) < k:
        best = None
        for i in rel:
            if any(i == s[1] for s in sel):
                continue
            ms = max(
                cos(vecs[i].astype(np.float64), vecs[s[1]].astype(np.float64))
                for s in sel
            )
            score = lam * rel[i] - (1 - lam) * ms
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, rel[i], score)
        sel.append((len(sel) + 1, best[1], best[2], best[3]))
    return sel


def test_mmr_matches_python_oracle(spark):
    from eget_spark.operators.similarity import mmr_rerank

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS.items()],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r.sel_rank, r.id, r.rel, r.mmr_score)
        for r in mmr_rerank(
            df.where("vec_id <> 5"), df.where("vec_id = 5"),
            n_candidates=10, k=4,
        ).orderBy("sel_rank").collect()
    ]
    want = _py_mmr(VECS, 5, n_cand=10, k=4)
    assert got == want


def test_mmr_penalizes_redundancy(spark):
    """Three near-identical vectors close to the query plus one distinct
    direction: plain top-3 would take the clones; MMR at lambda=0.5 must
    pick the distinct vector second."""
    rows = [
        (1, [10.0, 0.0, 0.0]),
        (2, [10.0, 0.01, 0.0]),
        (3, [10.0, 0.02, 0.0]),
        (4, [5.0, 0.0, 8.0]),
        (99, [9.0, 0.0, 1.0]),  # query
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        r.id
        for r in mmr_rerank(
            df.where("vec_id <> 99"), df.where("vec_id = 99"),
            n_candidates=4, k=3,
        ).orderBy("sel_rank").collect()
    ]
    assert got[0] == 1       # nearest neighbor first
    assert got[1] == 4       # the diverse direction beats clones 2/3
