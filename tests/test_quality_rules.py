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


def _dup_cover_oracle(text: str, n: int) -> tuple[int, float]:
    words = [w for w in re.split(r"\s+", text) if w]
    wchars = sum(len(w) for w in words)
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    c = Counter(grams)
    covered: set[int] = set()
    for i, g in enumerate(grams):
        if c[g] > 1:
            covered.update(range(i, i + n))
    cc = sum(len(words[i]) for i in covered)
    return len(words), (round(cc / wchars, 6) if covered and wchars else 0.0)


def test_dup_ngram_char_frac_matches_oracle(spark):
    from eget_spark.operators.quality_rules import dup_ngram_char_frac

    docs = [
        ("boiler", "click here now to buy click here now please"),
        ("fullrep", "a b c a b c a b c"),
        ("clean", "every word here is entirely different always"),
        ("overlap", "x y x y x y z"),  # overlapping dup bigram chains
        ("short", "one two"),
        ("empty", ""),
    ]
    for n in (2, 3):
        df = spark.createDataFrame(docs, "doc_id string, text string")
        got = {
            r["id"]: r for r in dup_ngram_char_frac(df, n=n).collect()
        }
        for doc_id, text in docs:
            wn, wf = _dup_cover_oracle(text, n)
            assert got[doc_id]["n_words"] == wn, (doc_id, n)
            assert abs(got[doc_id]["dup_ngram_char_frac"] - wf) < 1e-9, (
                doc_id,
                n,
                got[doc_id]["dup_ngram_char_frac"],
                wf,
            )
    # the designed separations hold
    assert got["fullrep"]["dup_ngram_char_frac"] == 1.0
    assert got["clean"]["dup_ngram_char_frac"] == 0.0


def test_top_ngram_coverage_generalizes_bigram(spark):
    from eget_spark.operators.quality_rules import (
        top_bigram_coverage,
        top_ngram_coverage,
    )

    docs = [
        ("a", "the cat sat on the cat sat again"),
        ("b", "one two"),
        ("c", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    tri = {r["id"]: r for r in top_ngram_coverage(df, n=3).collect()}
    assert tri["a"]["top_ngram"] == "the cat sat" and tri["a"]["top_ngram_n"] == 2
    assert tri["b"]["top_ngram"] is None and tri["b"]["top_ngram_char_frac"] == 0.0
    # n=2 path must agree with the original bigram operator
    bi_new = {
        (r["id"], r["top_ngram"], r["top_ngram_n"], r["top_ngram_char_frac"])
        for r in top_ngram_coverage(df, n=2).collect()
    }
    bi_old = {
        (r["id"], r["top_bigram"], r["top_bigram_n"], r["top_bigram_char_frac"])
        for r in top_bigram_coverage(df).collect()
    }
    assert bi_new == bi_old


def test_line_repetition_paragraph_sep(spark):
    from eget_spark.operators.quality_rules import line_repetition

    text = "para one here\n\npara two\n\npara one here\n\nlast"
    df = spark.createDataFrame([("a", text)], "doc_id string, text string")
    r = line_repetition(df, sep=r"\n\n+").collect()[0]
    assert r["n_lines"] == 4 and abs(r["dup_line_frac"] - 0.5) < 1e-9


def _gopher_oracle(text: str) -> dict:
    words = [w for w in re.split(r"\s+", text) if w]
    lines = [ln.strip(" ") for ln in text.split("\n") if ln.strip(" ")]
    n_words, n_lines = len(words), len(lines)
    hash_n = text.count("#")
    # replace-based non-overlapping '...' count, as pinned in the module
    ell3 = (len(text) - len(text.replace("...", ""))) / 3
    ell1 = len(text) - len(text.replace("…", ""))
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    bullets = sum(
        1 for ln in lines if ln.startswith(("- ", "* ", "•"))
    )
    ells = sum(1 for ln in lines if ln.endswith(("...", "…")))
    stop_hits = len(
        {w.lower() for w in words}
        & {"and", "be", "have", "of", "that", "the", "to", "with"}
    )
    f = lambda num, den: round(num / den, 6) if den else 0.0
    out = {
        "n_words": n_words,
        "mean_word_len": f(sum(len(w) for w in words), n_words),
        "alpha_word_frac": f(alpha, n_words),
        "symbol_word_ratio": f(hash_n + ell3 + ell1, n_words),
        "bullet_line_frac": f(bullets, n_lines),
        "ellipsis_line_frac": f(ells, n_lines),
        "stopword_hits": stop_hits,
    }
    out["gopher_pass"] = (
        50 <= n_words <= 100_000
        and 3.0 <= out["mean_word_len"] <= 10.0
        and out["symbol_word_ratio"] <= 0.1
        and out["bullet_line_frac"] <= 0.9
        and out["ellipsis_line_frac"] <= 0.3
        and out["alpha_word_frac"] >= 0.8
        and out["stopword_hits"] >= 2
    )
    return out


def test_gopher_signals_match_python_oracle(spark):
    from eget_spark.operators.quality_rules import gopher_signals

    docs = [
        ("good", "the quick brown fox and that dog have gone to town " * 6),
        ("bullets", "- one\n- two\n* three\n• four\nplain text line"),
        ("ellipses", "to be continued...\nand then…\nthe end"),
        ("hashes", "### heading # tag # tag # " + "word " * 60),
        ("numeric", " ".join(str(i) for i in range(80))),
        ("short", "too few words here"),
        ("longwords", " ".join(["supercalifragilistic"] * 60)),
        ("dots", "wait.... what....." + " the and of to be " * 20),
        ("empty", ""),
        ("ws", "   \n  \n"),
        ("nostop", "lorem ipsum dolor sit amet " * 12),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["id"]: r for r in gopher_signals(df).collect()}
    assert len(got) == len(docs)
    for doc_id, text in docs:
        want = _gopher_oracle(text)
        r = got[doc_id]
        for k, v in want.items():
            if isinstance(v, float):
                assert abs(r[k] - v) < 1e-9, (doc_id, k, r[k], v)
            else:
                assert r[k] == v, (doc_id, k, r[k], v)
    assert got["good"]["gopher_pass"] is True
    # each trap fixture fails for its designed reason
    assert got["numeric"]["alpha_word_frac"] == 0.0
    assert got["hashes"]["symbol_word_ratio"] > 0.0
    assert got["longwords"]["mean_word_len"] > 10.0
    assert got["nostop"]["stopword_hits"] < 2


def test_gopher_signals_zero_shuffle_zero_python(spark):
    from eget_spark.operators.quality_rules import gopher_signals

    df = spark.createDataFrame(
        [("a", "x y\n- b ...")], "doc_id string, text string"
    )
    plan = gopher_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure scan-side projection


def test_domain_quality_rollup_exact_micro_sums(spark):
    from eget_spark.operators.quality_rules import domain_quality_rollup

    rows = [
        ("a.com", 0.9), ("a.com", 0.8), ("a.com", 0.700001),
        ("b.org", 0.1), ("b.org", 0.2),
        ("c.io", 0.55),
    ]
    df = spark.createDataFrame(rows, "domain string, quality double")
    got = {r["domain"]: r for r in
           domain_quality_rollup(df, "domain", "quality", 0.55).collect()}
    assert got["a.com"]["sum_quality_micro"] == 900000 + 800000 + 700001
    assert got["a.com"]["avg_quality"] == round(2400001 / 3 / 1e6, 6)
    assert got["a.com"]["low_quality"] is False
    assert got["b.org"]["sum_quality_micro"] == 300000
    assert got["b.org"]["low_quality"] is True
    # exactly-at-threshold is NOT low (strict <)
    assert got["c.io"]["low_quality"] is False
    assert all(r["n_docs"] in (2, 3, 1) for r in got.values())


def test_adaptive_quality_filter_rank_cutoffs(spark):
    from eget_spark.operators.quality_rules import adaptive_quality_filter

    # two groups with known score ladders; bottom-decile cutoff = the
    # ceil(n/10)-th score ascending (ties pinned by id)
    rows = [(i, "a", float(i)) for i in range(20)]          # n=20 -> rank 2
    rows += [(100 + i, "b", 5.0) for i in range(5)]         # all equal, n=5 -> rank 1
    df = spark.createDataFrame(rows, "id long, g string, s double")
    got = {r["id"]: r for r in
           adaptive_quality_filter(df, "g", "s", "id", 1, 10).collect()}
    # group a: cutoff = score at asc rank 2 = 1.0; id 0 (score 0.0) dropped
    assert got[0]["cutoff"] == 1.0 and got[0]["keep"] is False
    assert got[1]["keep"] is True and got[19]["keep"] is True
    # group b: all scores equal -> cutoff 5.0, everyone kept (>=)
    assert all(got[100 + i]["keep"] is True for i in range(5))
    # every row of the input comes back exactly once
    assert len(got) == 25


def test_robots_directives_parsing_and_none(spark):
    from eget_spark.functions.metadata import robots_directives
    from pyspark.sql import functions as F

    rows = [
        (0, '<meta name="robots" content="noindex">', ""),
        (1, '<meta name="robots" content="NOFOLLOW">', ""),
        (2, '<meta name="robots" content="none">', ""),
        (3, "<p>no tag</p>", ""),
        (4, "<p>no tag</p>", "noindex, nofollow"),
        (5, '<meta name="robots" content="index, follow">', ""),
        (6, '<meta NAME="robots" CONTENT="noindex">', ""),  # case-insensitive tag
    ]
    df = spark.createDataFrame(rows, "id long, html string, hdr string")
    ni, nf = robots_directives(F.col("html"), F.col("hdr"))
    got = {r["id"]: (r["ni"], r["nf"]) for r in
           df.select("id", ni.alias("ni"), nf.alias("nf")).collect()}
    assert got == {
        0: (True, False),
        1: (False, True),
        2: (True, True),   # none implies both
        3: (False, False),
        4: (True, True),   # header union
        5: (False, False),
        6: (True, False),
    }


def test_adaptive_quality_filter_null_group_not_dropped(spark):
    from eget_spark.operators.quality_rules import adaptive_quality_filter

    rows = [(1, None, 1.0), (2, None, 2.0), (3, "g", 5.0)]
    df = spark.createDataFrame(rows, "id long, g string, s double")
    got = {r["id"]: r for r in
           adaptive_quality_filter(df, "g", "s", "id", 1, 2).collect()}
    # every input row comes back — NULL group is a real partition
    assert set(got) == {1, 2, 3}
    # NULL-group cutoff = rank ceil(2/2)=1 -> 1.0; both rows keep
    assert got[1]["cutoff"] == 1.0 and got[1]["keep"] is True
    assert got[2]["keep"] is True and got[3]["keep"] is True
