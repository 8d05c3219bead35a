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
