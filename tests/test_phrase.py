"""Phrase matching (operators/search.phrase_counts)."""

import pytest

from eget_spark.operators.search import phrase_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_basic_counts_and_absent_docs_dropped(spark):
    rows = [
        (1, "the quick fox and the quick fox again"),
        (2, "quick the fox"),
        (3, "the quick brown fox"),
    ]
    out = {r["id"]: r["n_hits"] for r in phrase_counts(
        _docs(spark, rows), "id", "text", "the quick fox").collect()}
    assert out == {1: 2}


def test_overlapping_occurrences_counted(spark):
    out = phrase_counts(
        _docs(spark, [(1, "a a a a")]), "id", "text", "a a"
    ).collect()
    assert out[0]["n_hits"] == 3


def test_tokenization_matches_bm25_discipline(spark):
    # punctuation splits, case folds — same TOKEN_SPLIT as bm25_topk
    rows = [(1, "Hello, WORLD! hello world?")]
    out = phrase_counts(_docs(spark, rows), "id", "text", "hello world").collect()
    assert out[0]["n_hits"] == 2


def test_short_docs_safe(spark):
    rows = [(1, "one"), (2, ""), (3, "tiny doc")]
    assert phrase_counts(_docs(spark, rows), "id", "text", "one two three").count() == 0


def test_single_term_phrase_is_tf(spark):
    out = phrase_counts(_docs(spark, [(1, "x y x z x")]), "id", "text", "x").collect()
    assert out[0]["n_hits"] == 3


def test_empty_phrase_rejected(spark):
    with pytest.raises(ValueError):
        phrase_counts(_docs(spark, [(1, "a")]), "id", "text", "   ")
