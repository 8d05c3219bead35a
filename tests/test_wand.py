"""WAND pruning-bound stats vs a pure-Python BM25 replay."""

from __future__ import annotations

import math
import re


def _py_wand(rows, terms, k=10, k1=1.2, b=0.75):
    docs = []
    for did, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        docs.append((did, len(toks), [toks.count(t) for t in terms]))
    n = len(docs)
    sumdl = sum(dl for _, dl, _ in docs)
    dfs = [sum(1 for _, _, tfs in docs if tfs[i] > 0)
           for i in range(len(terms))]
    avgdl = sumdl / n
    scored = []
    for did, dl, tfs in docs:
        cs = []
        for i, tf in enumerate(tfs):
            if tf > 0:
                idf = math.log(1.0 + (n - dfs[i] + 0.5) / (dfs[i] + 0.5))
                cs.append(idf * tf * (k1 + 1.0)
                          / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            else:
                cs.append(0.0)
        scored.append((did, tfs, cs, round(sum(cs), 6)))
    ubs = [round(max(c[i] for _, _, c, _ in scored), 6)
           for i in range(len(terms))]
    top = sorted(((s, d) for d, _, _, s in scored if s > 0),
                 key=lambda x: (-x[0], x[1]))[:k]
    theta = min(s for s, _ in top)
    cands = [(d, tfs) for d, tfs, _, _ in scored if any(t > 0 for t in tfs)]
    skippable = sum(
        1 for _, tfs in cands
        if sum(ubs[i] for i in range(len(terms)) if tfs[i] > 0) < theta
    )
    skip_ppm = skippable * 10**6 // len(cands)
    return sorted(
        (terms[i], dfs[i], ubs[i], theta, len(cands), skippable, skip_ppm)
        for i in range(len(terms))
    )


ROWS = (
    # docs rich in 'alpha' only — skippable if ub(alpha) < theta
    [(i, "alpha " + "filler word soup goes here " * 3) for i in range(8)]
    # docs with both strong terms — these make the top-k
    + [(10 + i, ("alpha beta " * (i + 2)) + "tail text") for i in range(4)]
    # beta-only docs
    + [(20 + i, "beta other tokens entirely") for i in range(3)]
    # no-term docs: never candidates
    + [(30, "nothing relevant at all"), (31, "still nothing")]
)
TERMS = ["alpha", "beta"]


def _run(spark, rows, terms, k=10):
    from eget_spark.operators.search import wand_prune_stats

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = wand_prune_stats(df, "doc_id", "text", terms, k=k).collect()
    return sorted(
        (r["term"], r["df"], r["ub"], r["theta"], r["n_cands"],
         r["n_skippable"], r["skip_ppm"])
        for r in out
    )


def test_matches_python_replay(spark):
    assert _run(spark, ROWS, TERMS) == _py_wand(ROWS, TERMS)


def test_no_term_docs_not_candidates(spark):
    out = _run(spark, ROWS, TERMS)
    assert out[0][4] == 15  # 17 docs minus the 2 matching nothing


def test_small_k_prunes_more(spark):
    # tighter top-k -> higher theta -> weakly more skippable docs
    loose = _run(spark, ROWS, TERMS, k=10)[0]
    tight = _run(spark, ROWS, TERMS, k=1)[0]
    assert tight[3] >= loose[3]
    assert tight[5] >= loose[5]


def test_ub_bounds_every_score(spark):
    # sum of all ubs must be >= theta (the top doc is itself bounded)
    out = _run(spark, ROWS, TERMS)
    assert sum(r[2] for r in out) >= out[0][3]
