"""PPJoin prefix-filtered Jaccard join == the brute-force inverted-index
join (operators/dedup.ppjoin_pairs vs ngram_jaccard_pairs), across random
corpora and thresholds — the theorem's correctness pinned by equality."""

from __future__ import annotations

import random


def _corpus(seed, n_docs, vocab=25, max_len=30):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        words = [f"w{rng.randint(0, vocab)}" for _ in range(rng.randint(3, max_len))]
        rows.append((i, " ".join(words)))
    # plant exact and near duplicates
    rows.append((n_docs, rows[0][1]))
    rows.append((n_docs + 1, rows[1][1] + " extra tail words here"))
    return rows


def _pairs(df_result):
    return sorted(
        (r["id_a"], r["id_b"], r["jaccard"]) for r in df_result.collect()
    )


def test_ppjoin_equals_bruteforce(spark):
    from eget_spark.operators.dedup import ngram_jaccard_pairs, ppjoin_pairs

    for seed, t in [(63, 0.2), (64, 0.5), (65, 0.8)]:
        rows = _corpus(seed, 40)
        df = spark.createDataFrame(rows, "id long, text string")
        want = _pairs(ngram_jaccard_pairs(df, "id", "text", threshold=t, k=3))
        got = _pairs(ppjoin_pairs(df, "id", "text", threshold=t, k=3))
        assert got == want, (seed, t)
        if t <= 0.5:
            assert want, f"fixture degenerate at t={t}"


def test_ppjoin_exact_dup_and_disjoint(spark):
    from eget_spark.operators.dedup import ppjoin_pairs

    df = spark.createDataFrame(
        [
            (0, "a b c d e f"),
            (1, "a b c d e f"),
            (2, "p q r s t u v"),
        ],
        "id long, text string",
    )
    got = _pairs(ppjoin_pairs(df, "id", "text", threshold=0.9, k=3))
    assert got == [(0, 1, 1.0)]
