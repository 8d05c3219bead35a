"""Train/test contamination detection vs a pure-Python oracle."""

from __future__ import annotations

import re


def _grams(text: str, n: int) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    toks = [t for t in toks if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_matches_python_oracle(spark):
    from eget_spark.operators.decontaminate import (
        contamination_flags,
        contamination_pairs,
        decontaminate,
    )

    corpus = [
        ("d1", "the quick brown fox jumps over the lazy dog tonight"),
        ("d2", "completely unrelated text with no overlap whatsoever here"),
        ("d3", "we saw the quick brown fox jumps over a fence"),
        ("d4", "short"),
        ("d5", "another clean document about spark dataflow engines"),
    ]
    bench = [
        ("b1", "quick brown fox jumps over the lazy"),
        ("b2", "short"),
    ]
    n = 5
    docs = spark.createDataFrame(corpus, "doc_id string, text string")
    bdf = spark.createDataFrame(bench, "doc_id string, text string")

    want_pairs = {}
    for did, dtext in corpus:
        for bid, btext in bench:
            shared = _grams(dtext, n) & _grams(btext, n)
            if shared:
                want_pairs[(did, bid)] = len(shared)
    got_pairs = {
        (r["id"], r["bench_id"]): r["n_shared"]
        for r in contamination_pairs(docs, bdf, n=n).collect()
    }
    assert got_pairs == want_pairs
    assert ("d1", "b1") in got_pairs and ("d3", "b1") in got_pairs
    assert ("d4", "b2") in got_pairs  # sub-n texts: whole-text gram

    flags = {r["id"] for r in contamination_flags(docs, bdf, n=n).collect()}
    assert flags == {d for d, _ in want_pairs}

    clean, flagged = decontaminate(docs, bdf, n=n)
    assert {r["doc_id"] for r in clean.collect()} == {"d2", "d5"}
    assert {r["id"] for r in flagged.collect()} == flags


def test_contamination_plan_broadcasts_benchmark(spark):
    """Scale shape: the benchmark n-gram set broadcasts; the corpus side
    never shuffles for the join (only the shingle window keys on id)."""
    from eget_spark.operators.decontaminate import contamination_pairs

    docs = spark.range(200).selectExpr(
        "CAST(id AS STRING) AS doc_id",
        "'w' || id || ' x y z a b c d e f g h i j k' AS text",
    )
    bench = spark.createDataFrame(
        [("b", "x y z a b c d e f g h i j k")], "doc_id string, text string"
    )
    pairs = contamination_pairs(docs, bench, n=13)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_split_leakage_matches_python_oracle(spark):
    from eget_spark.operators.decontaminate import split_leakage

    rows = [
        (0, "train", "a b c d e f"),      # grams: abcde bcdef
        (1, "train", "a b c d e x"),      # shares abcde? gram 'a b c d e' yes
        (2, "test", "a b c d e f"),       # exact dup of 0 across boundary
        (3, "test", "q r s t u v"),       # clean
        (4, "val", "b c d e f g"),        # shares 'b c d e f' with 0/2
        (5, "val", "short text"),         # len<5 -> whole-text gram
        (6, "train", "short text"),       # whole-text collision with 5
    ]
    df = spark.createDataFrame(rows, "doc_id long, split string, text string")
    got = {
        (r["split_a"], r["split_b"]): (r["n_grams_shared"], r["n_collisions"])
        for r in split_leakage(df, "split", "doc_id", "text", 5).collect()
    }

    def grams(t):
        w = t.split()
        if len(w) < 5:
            return {" ".join(w)}
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}

    from collections import Counter, defaultdict

    per_split = defaultdict(Counter)
    for _, sp, t in rows:
        for g in grams(t):
            per_split[sp][g] += 1
    want = {}
    names = sorted(per_split)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            shared = set(per_split[a]) & set(per_split[b])
            if shared:
                want[(a, b)] = (
                    len(shared),
                    sum(per_split[a][g] * per_split[b][g] for g in shared),
                )
    assert got == want
    # the exact train/test dup must register
    assert got[("test", "train")][0] >= 2
