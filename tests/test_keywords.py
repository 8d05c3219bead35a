"""TextRank keyword extraction vs a pure-Python fixed-point replay."""

from __future__ import annotations

import re

TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")
SCALE = 10**12
BASE = (SCALE * 3) // 20


def _toks(text):
    return [t for t in TOKEN_SPLIT.split(text.lower()) if t]


def _py_textrank(texts, n_iter=5, k=3):
    rows = []
    for doc_id, text in enumerate(texts):
        ts = _toks(text)
        und = set()
        for a, b in zip(ts, ts[1:]):
            if a != b:
                und.add((min(a, b), max(a, b)))
        nbrs: dict[str, set] = {}
        for a, b in und:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        deg = {w: len(v) for w, v in nbrs.items()}
        r = {w: SCALE for w in nbrs}
        for _ in range(n_iter):
            r = {
                v: BASE + (17 * sum(r[u] // deg[u] for u in nbrs[v])) // 20
                for v in nbrs
            }
        ranked = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for i, (w, score) in enumerate(ranked):
            rows.append((doc_id, w, score, i + 1))
    rows.sort()
    return rows


def _run(spark, texts, **kw):
    from eget_spark.operators.keywords import textrank_keywords

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = textrank_keywords(df, **kw).collect()
    return sorted((r["id"], r["word"], r["rank_fp"], r["kw_rank"]) for r in out)


def test_textrank_matches_python_replay(spark):
    texts = [
        "compatibility of systems of linear constraints over the set of "
        "natural numbers criteria of compatibility of a system",
        "the cat sat on the mat the cat ate",
        "spark shuffle join spark join window shuffle spark",
    ]
    assert _run(spark, texts) == _py_textrank(texts)


def test_textrank_hub_word_wins(spark):
    # 'hub' is adjacent to 4 distinct words; each leaf only to hub:
    # hub must rank first
    got = _run(spark, ["hub aa hub bb hub cc hub dd"], k=1)
    assert len(got) == 1 and got[0][1] == "hub" and got[0][3] == 1


def test_textrank_degenerate_docs_emit_nothing(spark):
    # single word, pure repetition (only self-pairs), and empty text
    # produce no graph and no keywords
    got = _run(spark, ["solo", "spam spam spam", "", "  .,  "])
    assert got == []


def _py_rake(texts, k=3):
    from eget_spark.operators.keywords import RAKE_STOPWORDS

    stop = set(RAKE_STOPWORDS)
    rows = []
    for doc_id, text in enumerate(texts):
        phrases = []
        for frag in re.split(r"[^a-z0-9\s]+", text.lower()):
            cur: list[str] = []
            for w in re.split(r"\s+", frag):
                if not w:
                    continue
                if w in stop:
                    if cur:
                        phrases.append(tuple(cur))
                    cur = []
                else:
                    cur.append(w)
            if cur:
                phrases.append(tuple(cur))
        freq: dict[str, int] = {}
        deg: dict[str, int] = {}
        for p in phrases:
            for w in p:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(p)
        wscore = {w: (deg[w] * 1_000_000) // freq[w] for w in freq}
        scores: dict[str, int] = {}
        for p in set(phrases):
            scores[" ".join(p)] = sum(wscore[w] for w in p)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for i, (phrase, s) in enumerate(ranked):
            rows.append((doc_id, phrase, s, i + 1))
    rows.sort()
    return rows


def _run_rake(spark, texts, **kw):
    from eget_spark.operators.keywords import rake_phrases

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = rake_phrases(df, **kw).collect()
    return sorted(
        (r["id"], r["phrase"], r["score_micro"], r["kw_rank"]) for r in out
    )


def test_rake_matches_python_replay(spark):
    texts = [
        "compatibility of systems of linear constraints over the set of "
        "natural numbers. criteria of compatibility, upper bounds and "
        "minimal generating sets are given",
        "the quick brown fox jumps over a lazy dog and the dog sleeps",
        "deep neural networks, deep learning. neural architecture search",
    ]
    assert _run_rake(spark, texts) == _py_rake(texts)


def test_rake_punctuation_breaks_phrases(spark):
    # same words; the period must split the candidate phrase
    a = _run_rake(spark, ["alpha beta. gamma"], k=5)
    b = _run_rake(spark, ["alpha beta gamma"], k=5)
    assert {r[1] for r in a} == {"alpha beta", "gamma"}
    assert {r[1] for r in b} == {"alpha beta gamma"}


def test_rake_duplicate_phrase_scored_once(spark):
    # "big data" occurs twice: ranked once, but freq/deg count both
    got = _run_rake(spark, ["big data and big data"], k=5)
    assert len(got) == 1
    # freq(big)=2 deg(big)=4 -> 2e6; same for data; phrase = 4e6
    assert got[0] == (0, "big data", 4_000_000, 1)


def test_rake_all_stopwords_emits_nothing(spark):
    assert _run_rake(spark, ["the of and a", ""]) == []
