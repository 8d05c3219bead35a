"""Focused-crawl scoring and n-gram novelty vs pure-Python oracles."""

from __future__ import annotations

import re

from eget_spark.operators.focus import focused_priorities, keyword_relevance
from eget_spark.operators.novelty import ngram_novelty


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- keyword relevance + propagation -----------------------------------------


def _py_rel(text, kws):
    return sum(1 for t in text.strip().lower().split() if t in kws)


def test_keyword_relevance_counts_occurrences(spark):
    rows = [
        (0, "spark spark join other"),
        (1, "nothing topical here"),
        (2, "Query SPARK"),  # case-insensitive
        (3, ""),
    ]
    kws = ["spark", "query", "join"]
    got = {
        r["id"]: r["rel"]
        for r in keyword_relevance(_pages(spark, rows), "doc_id", "text", kws).collect()
    }
    assert got == {i: _py_rel(t, set(kws)) for i, t in rows}
    assert got[0] == 3  # occurrences, not distinct hits


def test_focused_priorities_max_inbound_decayed(spark):
    rel = spark.createDataFrame(
        [(0, 9), (1, 4), (2, 0)], "id long, rel long"
    )
    edges = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 6), (0, 6)], "src long, dst long"
    )
    got = {
        r["dst"]: r["priority"]
        for r in focused_priorities(rel, edges, 1, 2).collect()
    }
    # dst 5: max(9//2, 4//2) = 4; dst 6: max(0//2, 9//2) = 4
    assert got == {5: 4, 6: 4}


def test_focused_priorities_decay_ratio(spark):
    rel = spark.createDataFrame([(0, 7)], "id long, rel long")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = focused_priorities(rel, edges, 2, 3).collect()[0]
    assert got["priority"] == (7 * 2) // 3


# --- n-gram novelty -----------------------------------------------------------


def _py_novelty(rows, n=3):
    def grams(text):
        toks = text.strip().lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    gsets = {i: grams(t) for i, t in rows}
    first = {}
    for i in sorted(gsets):
        for g in gsets[i]:
            first.setdefault(g, i)
    out = {}
    for i, gs in gsets.items():
        novel = sum(1 for g in gs if first[g] == i)
        out[i] = (len(gs), novel, (1000 * novel) // len(gs))
    return out


def test_ngram_novelty_matches_python_oracle(spark):
    rows = [
        (0, "a b c d e"),
        (1, "a b c x y"),  # shares 'a b c' with doc 0
        (2, "a b c d e"),  # full repeat of doc 0 -> 0 novelty
        (3, "short"),  # < n tokens: whole string is the gram
        (4, "short"),  # repeat of doc 3's short gram
        (5, ""),
    ]
    got = {
        r["id"]: (r["n_grams"], r["n_novel"], r["novelty_permille"])
        for r in ngram_novelty(_pages(spark, rows), "doc_id", "text", 3).collect()
    }
    assert got == _py_novelty(rows)
    assert got[2] == (3, 0, 0)
    assert got[4][2] == 0


def test_ngram_novelty_first_occurrence_is_id_order(spark):
    """The winner is min doc_id, not input order."""
    rows = [(9, "x y z w"), (1, "x y z w")]
    got = {
        r["id"]: r["novelty_permille"]
        for r in ngram_novelty(_pages(spark, rows), "doc_id", "text", 3).collect()
    }
    assert got == {1: 1000, 9: 0}
