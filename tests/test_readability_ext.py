"""Fog / SMOG / Coleman-Liau vs a pure-Python replay."""

from __future__ import annotations

import math
import re


def _py_indices(rows):
    out = {}
    for did, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        n_w = len(toks)
        n_cx = sum(1 for w in toks if len(re.findall(r"[aeiouy]+", w)) >= 3)
        n_lt = sum(len(w) for w in toks)
        n_s = max(1, len(re.findall(r"[.!?]+", text)))
        if n_w == 0:
            out[did] = (n_s, 0, 0, 0, None, None, None)
            continue
        fog = round(0.4 * (n_w / n_s + (n_cx * 100) / n_w), 6)
        smog = round(1.043 * math.sqrt((n_cx * 30) / n_s) + 3.1291, 6)
        cli = round(
            0.0588 * ((n_lt * 100) / n_w) - 0.296 * ((n_s * 100) / n_w)
            - 15.8, 6
        )
        out[did] = (n_s, n_w, n_cx, n_lt, fog, smog, cli)
    return out


ROWS = [
    (1, "The cat sat. The dog ran. All short words here."),
    (2, "Extraordinarily complicated terminology overwhelms investigative "
        "journalism. Bureaucratic obfuscation perpetuates institutional "
        "inertia."),
    (3, "One sentence without any terminal punctuation at all"),
    (4, "!!!"),
    (5, "Mixed difficulty: some polysyllabic vocabulary alongside tiny "
        "words. Readability estimation requires representative samples!"),
]


def _run(spark, rows):
    from eget_spark.functions.text import readability_indices

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = readability_indices(df, "doc_id", "text").collect()
    return {
        r["id"]: (r["n_sentences"], r["n_words"], r["n_complex"],
                  r["n_letters"], r["fog"], r["smog"], r["cli"])
        for r in out
    }


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_indices(ROWS)


def test_complex_prose_scores_harder(spark):
    got = _run(spark, ROWS)
    assert got[2][4] > got[1][4]  # fog
    assert got[2][5] > got[1][5]  # smog
    assert got[2][6] > got[1][6]  # coleman-liau


def test_no_terminal_punct_floors_sentences(spark):
    assert _run(spark, ROWS)[3][0] >= 1


def test_zero_word_doc_is_null(spark):
    got = _run(spark, ROWS)[4]
    assert got[1] == 0 and got[4] is None and got[5] is None and got[6] is None


def test_smog_closed_form(spark):
    # 3 complex words over 1 sentence: smog = 1.043*sqrt(90) + 3.1291
    rows = [(9, "extraordinary bureaucratic investigative run")]
    got = _run(spark, rows)[9]
    assert got[2] == 3
    assert got[5] == round(1.043 * (90 ** 0.5) + 3.1291, 6)
