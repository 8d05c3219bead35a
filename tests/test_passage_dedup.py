"""ExactSubstr-style passage dedup vs a brute-force Python oracle."""

from __future__ import annotations

import pytest

from eget_spark.operators.passage_dedup import dedup_passages

PASSAGE = "alpha beta gamma delta epsilon zeta eta theta"


def _py_dedup(rows: list[tuple[int, str]], n: int) -> dict[int, tuple[str, int, int]]:
    first: dict[str, tuple[int, int]] = {}
    dup: dict[int, set[int]] = {i: set() for i, _ in rows}
    toks = {i: t.split() for i, t in rows}
    for i, _ in sorted(rows):
        ts = toks[i]
        for pos in range(len(ts) - n + 1):
            g = " ".join(ts[pos : pos + n])
            if g in first:
                dup[i].add(pos)
            else:
                first[g] = (i, pos)
    out = {}
    for i, _ in rows:
        ts = toks[i]
        removed = {t for p in dup[i] for t in range(p, p + n)}
        kept = [t for k, t in enumerate(ts) if k not in removed]
        out[i] = (" ".join(kept), len(ts), len(removed))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, PASSAGE + " unique tail zero"),
        (1, PASSAGE + " unique tail one"),  # shares the 8-token passage
        (2, PASSAGE),  # the passage alone -> fully covered for n<=8
        (3, "short doc"),  # < n tokens: untouched
        (4, "x y z x y z x y z w"),  # in-doc repetition
        (5, "  spaced \n tokens \t with   messy whitespace " + PASSAGE),
        (6, ""),  # empty
        (7, PASSAGE + " " + PASSAGE),  # passage twice in one doc
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("n", [3, 5, 8])
def test_matches_bruteforce(spark, corpus, n):
    rows, df = corpus
    # the oracle tokenizes with str.split(), the engine with \s+: identical
    norm = [(i, " ".join(t.split())) for i, t in rows]
    expected = _py_dedup(norm, n)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in dedup_passages(df, n=n).collect()
    }
    assert got == expected


def test_first_occurrence_survives_later_removed(spark, corpus):
    _, df = corpus
    got = {r["doc_id"]: r for r in dedup_passages(df, n=8).collect()}
    assert got[0]["text"].startswith(PASSAGE)  # doc 0 is the first occurrence
    assert got[0]["n_removed"] == 0
    # doc 1 shares grams at positions 0-2 with doc 0 ("...unique tail" is
    # common too), covering tokens 0-9: only the final token survives
    assert got[1]["text"] == "one" and got[1]["n_removed"] == 10
    assert got[2]["text"] == "" and got[2]["n_removed"] == 8  # fully covered
    assert got[3]["text"] == "short doc" and got[3]["n_removed"] == 0
    # doc 7: second in-doc copy of the passage removed, first copy kept
    # (it duplicates doc 0's grams, which are earlier in corpus order)
    assert got[7]["n_tokens"] == 16 and got[7]["n_removed"] == 16


def test_order_col_overrides_id_order(spark):
    rows = [(10, PASSAGE, 2), (20, PASSAGE, 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, ord int")
    got = {
        r["doc_id"]: r["n_removed"]
        for r in dedup_passages(df, n=8, order_col="ord").collect()
    }
    assert got == {20: 0, 10: 8}  # doc 20 wins: earlier ord


def test_no_python_stages(spark, corpus):
    _, df = corpus
    plan = dedup_passages(df, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
