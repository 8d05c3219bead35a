"""All-pairs tf-cosine vs a Python oracle + df-prune and plan checks."""

from __future__ import annotations

import math
import re
from collections import Counter


def _oracle(docs, max_df, min_cos):
    tfs = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        tfs[doc_id] = Counter(toks)
    df_count = Counter()
    for c in tfs.values():
        for t in c:
            df_count[t] += 1
    keep = {t for t, d in df_count.items() if 2 <= d <= max_df}
    pruned = {i: {t: c for t, c in tc.items() if t in keep} for i, tc in tfs.items()}
    out = {}
    ids = sorted(pruned)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = set(pruned[a]) & set(pruned[b])
            if not shared:
                continue
            dot = sum(pruned[a][t] * pruned[b][t] for t in shared)
            na = math.sqrt(float(sum(v * v for v in pruned[a].values())))
            nb = math.sqrt(float(sum(v * v for v in pruned[b].values())))
            cos = dot / (na * nb)
            if cos >= min_cos:
                out[(a, b)] = (dot, round(cos, 9))
    return out


def test_tf_cosine_pairs_matches_python_oracle(spark):
    from eget_spark.operators.allpairs import tf_cosine_pairs

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a sleeping dog"),
        (3, "completely different text about spark shuffles"),
        (4, "spark shuffles move data between completely different executors"),
        (5, "the the the quick quick brown"),
        (6, "singletonword onlyhere"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(4)
    got = {
        (r["id_a"], r["id_b"]): (r["dot"], round(r["cos"], 9))
        for r in tf_cosine_pairs(df, "doc_id", "text", max_df=10, min_cos=0.1).collect()
    }
    assert got == _oracle(docs, 10, 0.1)


def test_stop_terms_pruned_by_max_df(spark):
    from eget_spark.operators.allpairs import tf_cosine_pairs

    # "common" is in every doc; with max_df=2 it cannot pair anything,
    # and the remaining vocabularies are disjoint -> no pairs at all.
    docs = [(i, f"common unique{i}") for i in range(1, 6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert tf_cosine_pairs(df, "doc_id", "text", max_df=2, min_cos=0.0).count() == 0
    # raising max_df makes it pairable again: every pair shares "common"
    n = tf_cosine_pairs(df, "doc_id", "text", max_df=10, min_cos=0.0).count()
    assert n == 10  # C(5,2)


def test_norms_use_pruned_vocabulary(spark):
    from eget_spark.operators.allpairs import tf_cosine_pairs

    # docs 1/2 identical over kept vocab; doc 1's extra singleton term
    # (df=1, pruned) must NOT depress the cosine below 1.0
    docs = [(1, "alpha beta uniquejunk"), (2, "alpha beta"), (3, "alpha beta")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = tf_cosine_pairs(df, "doc_id", "text", max_df=10, min_cos=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2), (1, 3), (2, 3)}
    assert all(abs(r["cos"] - 1.0) < 1e-12 for r in rows)


def test_plan_shape(spark):
    """No Python eval, no cartesian, no forced broadcast of the vocab."""
    from eget_spark.operators.allpairs import tf_cosine_pairs

    docs = [(i, f"w{i % 3} w{(i + 1) % 3} x{i}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    plan = tf_cosine_pairs(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
