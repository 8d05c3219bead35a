"""Gopher-style repetition quality rules vs a Python oracle."""

from __future__ import annotations

import re
from collections import Counter


def _line_oracle(text: str) -> tuple[int, float, float]:
    # trim = ASCII-space trim (Spark/DuckDB `trim` semantics — tabs are
    # NOT trimmed, so a tab-only line counts as non-empty)
    lines = [ln for ln in text.split("\n") if ln.strip(" ")]
    if not lines:
        return 0, 0.0, 0.0
    c = Counter(lines)
    dup_n = sum(n for n in c.values() if n > 1)
    total_chars = sum(len(ln) for ln in lines)
    dup_chars = sum(len(ln) * n for ln, n in c.items() if n > 1)
    return (
        len(lines),
        round(dup_n / len(lines), 6),
        round(dup_chars / total_chars, 6),
    )


def _top_oracle(text: str) -> tuple[str | None, int, float]:
    words = [w for w in re.split(r"\s+", text) if w]
    if len(words) < 2:
        return None, 0, 0.0
    c = Counter(" ".join(p) for p in zip(words, words[1:]))
    # ties: (count DESC, bigram ASC) — pinned in the module docstring
    bg, n = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    return bg, n, round(n * len(bg) / len(text), 6)


def test_repetition_signals_match_python_oracle(spark):
    from eget_spark.operators.quality_rules import repetition_signals

    docs = [
        ("boiler", "nav home\nnav home\nnav home\ncontent paragraph here"),
        ("degenerate", "the cat the cat the cat the cat sat"),
        ("clean", "a fresh sentence.\nanother different line entirely."),
        ("empty", ""),
        ("oneword", "solo"),
        ("ws", "   \n\t\n  "),
        ("tied", "b b a a"),  # bigrams: 'b b','b a','a a' all x1 -> 'a a' wins
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["id"]: r for r in repetition_signals(df).collect()}
    assert len(got) == len(docs)
    for doc_id, text in docs:
        n_lines, dlf, dlcf = _line_oracle(text)
        bg, n, cov = _top_oracle(text)
        r = got[doc_id]
        assert r["n_lines"] == n_lines, doc_id
        assert abs(r["dup_line_frac"] - dlf) < 1e-9, doc_id
        assert abs(r["dup_line_char_frac"] - dlcf) < 1e-9, doc_id
        assert r["top_bigram"] == bg, doc_id
        assert r["top_bigram_n"] == n, doc_id
        assert abs(r["top_bigram_char_frac"] - cov) < 1e-9, doc_id
    # the Gopher paper's removal thresholds separate the fixtures
    assert got["boiler"]["dup_line_frac"] > 0.30
    assert got["degenerate"]["top_bigram_char_frac"] > 0.20
    assert got["clean"]["dup_line_frac"] == 0.0
    assert got["clean"]["top_bigram_char_frac"] < 0.20


def test_repetition_signals_no_python_in_plan(spark):
    from eget_spark.operators.quality_rules import repetition_signals

    df = spark.createDataFrame([("a", "x y\nx y")], "doc_id string, text string")
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
