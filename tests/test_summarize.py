"""Luhn sentence selection + negative-sampling table vs Python replays."""

from __future__ import annotations

import math
import re
from collections import Counter

from eget_spark.operators.keywords import RAKE_STOPWORDS


def _py_luhn(rows, min_freq=2, top_n=3):
    out = []
    for did, text in rows:
        doc_toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        counts = Counter(doc_toks)
        sig = {t for t, c in counts.items()
               if c >= min_freq and t not in RAKE_STOPWORDS}
        cands = []
        for idx, raw in enumerate(re.split(r"[.!?]+", text)):
            sent = re.sub(r"\s+$", "", re.sub(r"^\s+", "", raw))
            toks = [t for t in re.split(r"[^a-z0-9]+", sent.lower()) if t]
            if not toks:
                continue
            sc = sum(1 for t in toks if t in sig)
            if sc > 0:
                score = sc * sc * 10**6 // len(toks)
                cands.append((idx, len(toks), sc, score, sent))
        cands.sort(key=lambda c: (-c[3], c[0]))
        for idx, n, sc, score, sent in sorted(cands[:top_n]):
            out.append((did, idx, n, sc, score, sent))
    return out


LUHN_ROWS = [
    (1, "Spark engines shuffle data. Shuffle cost dominates spark jobs. "
        "The weather is nice today. Data shuffle tuning matters in spark."),
    (2, "only unique words appear here without any repetition at all."),
    (3, "alpha beta! alpha beta gamma? totally irrelevant filler text. "
        "alpha alone."),
]


def _run_luhn(spark, rows, **kw):
    from eget_spark.operators.summarize import luhn_sentences

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = luhn_sentences(df, "doc_id", "text", **kw).collect()
    return [(r["id"], r["sent_idx"], r["n_tok"], r["sig_cnt"],
             r["score_micro"], r["sentence"]) for r in out]


def test_luhn_matches_python_replay(spark):
    assert _run_luhn(spark, LUHN_ROWS) == _py_luhn(LUHN_ROWS)


def test_luhn_topic_sentences_win(spark):
    got = [r for r in _run_luhn(spark, LUHN_ROWS) if r[0] == 1]
    texts = " ".join(r[5] for r in got)
    assert "weather" not in texts  # the off-topic sentence never scores


def test_luhn_no_significant_words_no_output(spark):
    assert [r for r in _run_luhn(spark, LUHN_ROWS) if r[0] == 2] == []


def test_luhn_top_n_cap(spark):
    got = [r for r in _run_luhn(spark, LUHN_ROWS, top_n=1) if r[0] == 1]
    assert len(got) == 1


# --- negative sampling -------------------------------------------------------

def _py_negsample(rows, k=100):
    toks = []
    for _, text in rows:
        toks += [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    counts = Counter(toks)
    s = {t: round(1e6 * math.exp(0.75 * math.log(c)))
         for t, c in counts.items()}
    s_tot = sum(s.values())
    c_tot = sum(counts.values())
    rows_out = sorted(
        ((t, c, s[t], round(s[t] * 1e6 / s_tot), round(c * 1e6 / c_tot))
         for t, c in counts.items()),
        key=lambda r: (-r[1], r[0]),
    )
    return rows_out[:k]


def _run_negsample(spark, rows, k=100):
    from eget_spark.operators.sampling import negative_sampling_table

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = negative_sampling_table(df, "text", k=k).collect()
    return [(r["tok"], r["cnt"], r["s_micro"], r["share_ppm"],
             r["raw_ppm"]) for r in out]


def test_negsample_matches_python_replay(spark):
    assert _run_negsample(spark, LUHN_ROWS) == _py_negsample(LUHN_ROWS)


def test_negsample_flattens_the_head(spark):
    rows = [(1, "the " * 100 + "rare word here")]
    got = {r[0]: r for r in _run_negsample(spark, rows)}
    # head token's sampling share is well below its raw share
    assert got["the"][3] < got["the"][4]
    # tail tokens gain share
    assert got["rare"][3] > got["rare"][4]


def test_negsample_top_k(spark):
    assert len(_run_negsample(spark, LUHN_ROWS, k=5)) == 5
