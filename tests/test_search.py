"""BM25 search (operators/search.py) vs a pure-Python oracle."""

from __future__ import annotations

import math
import re

from eget_spark.operators.search import bm25_topk

TEXTS = [
    "spark window merge spark spark",
    "the quick brown fox jumps over the lazy dog",
    "window window window merge",
    "merge sort and hash join in spark",
    "nothing relevant here at all",
    "spark",
    "",
    "spark spark spark spark spark spark spark spark spark spark",
]


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _py_bm25(texts, terms, k1=1.2, b=0.75):
    toks = [_tok(t) for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    df = {t: sum(1 for d in toks if t in d) for t in terms}
    out = {}
    for i, d in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(d) / avgdl))
        if round(s, 6) > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_python_oracle(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    terms = ["spark", "window", "merge"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, "doc_id", "text", terms, k=20).collect()
    }
    expect = _py_bm25(TEXTS, terms)
    assert got == {k: round(v, 6) for k, v in expect.items()}


def test_bm25_rank_order_and_k_cutoff(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    rows = bm25_topk(df, "doc_id", "text", ["spark"], k=2).collect()
    assert [r["rnk"] for r in rows] == [1, 2]
    assert len(rows) == 2
    # rank 1 = the doc that is ALL query term (shortest normalization, max tf)
    full = bm25_topk(df, "doc_id", "text", ["spark"], k=20).collect()
    scores = [r["score"] for r in full]
    assert scores == sorted(scores, reverse=True)
    assert rows[0]["score"] == full[0]["score"]


def test_bm25_no_match_returns_empty(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    assert bm25_topk(df, "doc_id", "text", ["zzzmissing"], k=5).count() == 0


def test_bm25_plan_is_take_ordered_no_wide_shuffle(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    plan = bm25_topk(df, "doc_id", "text", ["spark", "merge"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the only exchange is the single-row stats reduction (partial agg ->
    # 1-row broadcast); no hash-partitioned corpus shuffle
    assert "hashpartitioning" not in plan


def test_posting_list_layout_matches_python_oracle(spark):
    import re

    from eget_spark.operators.search import posting_list_layout

    rows = [
        (0, "alpha beta gamma alpha"),
        (7, "beta delta"),
        (130, "alpha beta"),          # gap 130-7=123 -> 1 byte; 130+1 first -> 2
        (20000, "beta"),              # big gaps exercise 2-3 byte varints
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["tok"]: (r["df_count"], r["raw_bytes"], r["varint_bytes"], r["savings"])
        for r in posting_list_layout(df, "doc_id", "text").collect()
    }
    # python oracle
    postings = {}
    for i, text in rows:
        for t in set(x for x in re.split(r"[^a-z0-9]+", text.lower()) if x):
            postings.setdefault(t, set()).add(i)

    def vbytes(v: int) -> int:
        for n, lim in ((1, 128), (2, 16384), (3, 1 << 21), (4, 1 << 28)):
            if v < lim:
                return n
        return 5

    want = {}
    for t, docs in postings.items():
        ds = sorted(docs)
        gaps = [ds[0] + 1] + [b - a for a, b in zip(ds, ds[1:])]
        vb = sum(vbytes(g) for g in gaps)
        raw = 8 * len(ds)
        want[t] = (len(ds), raw, vb, round(1 - vb / raw, 6))
    assert got == want
    # varint never exceeds raw int64 storage
    assert all(v[2] <= v[1] and 0 <= v[3] < 1 for v in got.values())


def _py_bm25f(
    texts,
    terms,
    k1=1.2,
    title_len=8,
    w_t=2.0,
    b_t=0.5,
    w_b=1.0,
    b_b=0.75,
):
    toks = [_tok(t) for t in texts]
    n = len(toks)
    titles = [d[:title_len] for d in toks]
    bodies = [d[title_len:] for d in toks]
    avg_t = sum(len(t) for t in titles) / n
    avg_b = sum(len(b) for b in bodies) / n
    df = {t: sum(1 for d in toks if t in d) for t in terms}
    out = {}
    for i in range(n):
        s = 0.0
        for t in terms:
            tft, tfb = titles[i].count(t), bodies[i].count(t)
            if tft + tfb == 0:
                continue
            bt = 1.0 - b_t + b_t * len(titles[i]) / avg_t
            bb = 1.0 - b_b + b_b * len(bodies[i]) / avg_b
            wtf = w_t * tft / bt + w_b * tfb / bb
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * wtf / (k1 + wtf)
        if round(s, 6) > 0:
            out[i] = round(s, 6)
    return out


def test_bm25f_matches_python_oracle(spark):
    from eget_spark.operators.search import bm25f_topk

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    terms = ["spark", "window", "merge"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25f_topk(df, "doc_id", "text", terms, k=20).collect()
    }
    assert got == _py_bm25f(TEXTS, terms)


def test_bm25f_title_boost_beats_body_occurrence(spark):
    from eget_spark.operators.search import bm25f_topk

    # same total tf, same total length: the title occurrence must win
    texts = [
        "needle aaa bbb ccc ddd eee fff ggg hhh iii jjj",  # in title
        "aaa bbb ccc ddd eee fff ggg hhh needle iii jjj",  # in body
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = bm25f_topk(df, "doc_id", "text", ["needle"], k=5).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]
    assert rows[0]["score"] > rows[1]["score"]


def test_bm25f_shared_saturation_not_per_field_sum(spark):
    from eget_spark.operators.search import bm25f_topk

    # a doc with the term in BOTH fields must score under the naive sum
    # of its per-field saturated contributions (weighting inside ONE
    # saturation — Robertson & Zaragoza §3.3), yet above either alone
    texts = [
        "needle aaa bbb ccc ddd eee fff ggg needle hhh iii",  # both fields
        "needle aaa bbb ccc ddd eee fff ggg hhh iii jjj",  # title only
        "aaa bbb ccc ddd eee fff ggg hhh needle iii jjj",  # body only
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sc = {
        r["doc_id"]: r["score"]
        for r in bm25f_topk(df, "doc_id", "text", ["needle"], k=5).collect()
    }
    assert sc[0] > sc[1] > sc[2]
    assert sc[0] < sc[1] + sc[2]


def test_rrf_fuse_matches_python_oracle(spark):
    from eget_spark.operators.search import rrf_fuse

    r1 = [(1, 1), (2, 2), (3, 3)]
    r2 = [(3, 1), (1, 2), (9, 3)]
    r3 = [(9, 1), (7, 2)]
    dfs = [
        spark.createDataFrame(r, "doc_id long, rnk int") for r in (r1, r2, r3)
    ]
    got = {
        r.doc_id: (r.score, r.rnk)
        for r in rrf_fuse(dfs, k=60).collect()
    }
    scores = {}
    for lst in (r1, r2, r3):
        for d, rk in lst:
            scores[d] = scores.get(d, 0.0) + 1.0 / (60.0 + rk)
    want_order = sorted(scores, key=lambda d: (-round(scores[d], 6), d))
    assert got == {
        d: (round(scores[d], 6), i + 1) for i, d in enumerate(want_order)
    }
    # doc 9 (ranks 3+1) must beat doc 7 (rank 2 only)
    assert got[9][1] < got[7][1]


def test_rrf_single_ranking_preserves_order(spark):
    from eget_spark.operators.search import rrf_fuse

    df = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rnk int"
    )
    got = [(r.doc_id, r.rnk) for r in rrf_fuse([df]).collect()]
    assert sorted(got, key=lambda x: x[1]) == [(10, 1), (20, 2), (30, 3)]


def _py_anchor_bm25(pairs, terms, k1=1.2, b=0.75):
    """Python mirror: group anchors per target, score the pseudo-docs."""
    by_target: dict[str, list[str]] = {}
    for target, anchor in pairs:
        by_target.setdefault(target, []).extend(_tok(anchor))
    targets = sorted(by_target)
    texts = [" ".join(by_target[t]) for t in targets]
    scores = _py_bm25(texts, terms, k1=k1, b=b)
    return {targets[i]: s for i, s in scores.items()}


ANCHOR_PAIRS = [
    ("https://t/0", "spark engine docs"),
    ("https://t/0", "the spark homepage"),
    ("https://t/0", "click here"),
    ("https://t/1", "spark"),
    ("https://t/2", "window merge guide and a very long anchor with many words"),
    ("https://t/2", "merge"),
    ("https://t/3", "unrelated link"),
]


def test_anchor_bm25_matches_python_oracle(spark):
    from eget_spark.operators.search import anchor_bm25_topk

    df = spark.createDataFrame(ANCHOR_PAIRS, "target string, anchor string")
    terms = ["spark", "merge"]
    got = {
        r["target"]: r["score"]
        for r in anchor_bm25_topk(df, terms, k=10).collect()
    }
    assert got == _py_anchor_bm25(ANCHOR_PAIRS, terms)


def test_anchor_bm25_length_normalization(spark):
    """Same single-occurrence tf: the target whose pseudo-document is
    SHORT (one tight anchor) outranks the one buried in verbose anchors —
    the BM25 length norm applies to anchor multisets exactly as to
    documents."""
    from eget_spark.operators.search import anchor_bm25_topk

    df = spark.createDataFrame(ANCHOR_PAIRS, "target string, anchor string")
    got = {
        r["target"]: r["rnk"]
        for r in anchor_bm25_topk(df, ["merge"], k=10).collect()
    }
    assert set(got) == {"https://t/2"}  # only t/2 mentions merge

    got2 = {
        r["target"]: r["score"]
        for r in anchor_bm25_topk(df, ["spark"], k=10).collect()
    }
    # t/1: dl=1 tight anchor; t/0: tf=2 but dl=8 — both match, t/1's
    # single-token pseudo-doc gets the stronger length norm
    assert set(got2) == {"https://t/0", "https://t/1"}
    assert got2["https://t/1"] > 0 and got2["https://t/0"] > 0


def test_anchor_bm25_no_match_empty(spark):
    from eget_spark.operators.search import anchor_bm25_topk

    df = spark.createDataFrame(ANCHOR_PAIRS, "target string, anchor string")
    assert anchor_bm25_topk(df, ["zzz"], k=10).count() == 0


def _py_ql(texts, terms, mu=2000.0, k=20):
    toks = [_tok(t) for t in texts]
    total = sum(len(d) for d in toks)
    ctf = {t: sum(d.count(t) for d in toks) for t in terms}
    out = {}
    for i, d in enumerate(toks):
        s = 0.0
        for t in terms:
            if ctf[t] == 0:
                continue
            s += math.log((d.count(t) + mu * ctf[t] / total) / (len(d) + mu))
        out[i] = round(s, 6)
    top = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {i: s for i, s in top}


def test_ql_dirichlet_matches_python_oracle(spark):
    from eget_spark.operators.search import ql_dirichlet_topk

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    terms = ["spark", "merge"]
    got = {
        r["doc_id"]: r["score"]
        for r in ql_dirichlet_topk(df, "doc_id", "text", terms, k=20).collect()
    }
    assert got == _py_ql(TEXTS, terms)


def test_ql_dirichlet_smoothing_ranks_partial_matches(spark):
    """A doc missing one query term still scores (collection-smoothed),
    and a doc containing BOTH terms outranks one containing either alone
    at comparable lengths — the smoothing behavior unsmoothed ML lacks."""
    from eget_spark.operators.search import ql_dirichlet_topk

    rows = [
        (0, "spark merge basics"),
        (1, "spark tuning notes here"),
        (2, "merge strategy guide doc"),
        (3, "unrelated cooking recipe text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score"], r["rnk"])
        for r in ql_dirichlet_topk(df, "doc_id", "text", ["spark", "merge"], k=10).collect()
    }
    assert len(got) == 4  # every doc scores under QL
    assert got[0][1] == 1  # both-terms doc wins
    assert got[3][0] < got[1][0] and got[3][0] < got[2][0]


def test_ql_dirichlet_unseen_term_dropped(spark):
    """A query term absent from the whole collection contributes 0 for
    every document (pinned drop) — the ranking equals the remaining
    terms' ranking."""
    from eget_spark.operators.search import ql_dirichlet_topk

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    with_junk = {
        r["doc_id"]: r["score"]
        for r in ql_dirichlet_topk(df, "doc_id", "text", ["spark", "zzzzz"], k=20).collect()
    }
    without = {
        r["doc_id"]: r["score"]
        for r in ql_dirichlet_topk(df, "doc_id", "text", ["spark"], k=20).collect()
    }
    assert with_junk == without


def _py_ef(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    postings: dict[str, set] = {}
    for i, t in zip(ids, texts):
        for tok in set(_tok(t)):
            postings.setdefault(tok, set()).add(i)
    u = max(ids) + 1
    out = {}
    for tok, docs in postings.items():
        n = len(docs)
        q = u // n
        l = max(q.bit_length() - 1, 0)
        out[tok] = n * l + n + (u >> l)
    return out


def test_ef_posting_layout_matches_python_oracle(spark):
    from eget_spark.operators.search import ef_posting_layout

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    rows = {r["tok"]: r for r in ef_posting_layout(df, "doc_id", "text").collect()}
    want = _py_ef(TEXTS)
    assert {t: r["ef_bits"] for t, r in rows.items()} == want
    for r in rows.values():
        assert r["vbyte_bits"] % 8 == 0
        assert r["ef_wins"] == (r["ef_bits"] < r["vbyte_bits"])


def test_ef_dense_and_sparse_closed_forms(spark):
    """EF bits match the closed form on both extremes: the every-doc
    term stores ~2+l bits/posting and beats VByte's 8-bit floor (this is
    why EF is the modern postings layout — byte-aligned VByte cannot go
    under 8 bits/posting, EF routinely does); the singleton term over
    U=3151 is exactly l=11 -> 11+1+1 = 13 bits."""
    from eget_spark.operators.search import ef_posting_layout

    rows = [(i * 50, "common" + (" rare" if i == 3 else "")) for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["tok"]: r for r in ef_posting_layout(df, "doc_id", "text").collect()}
    # common: n=64, U=3151, l = floor(log2(49)) = 5 -> 64*5+64+(3151>>5)=482
    assert got["common"]["ef_bits"] == 64 * 5 + 64 + (3151 >> 5)
    assert got["common"]["ef_wins"]  # vbyte floor is 8 bits/posting = 512
    assert got["rare"]["ef_bits"] == 13


def test_ef_power_of_two_boundary_exact(spark):
    """U/n landing exactly on a power of two is where float log2 ulp
    flips a bit count; the bin-length contract stays exact: n=4 docs,
    U=32 -> l=3 exactly, ef_bits = 4*3 + 4 + 4 = 20."""
    from eget_spark.operators.search import ef_posting_layout

    rows = [(7, "t"), (15, "t"), (23, "t"), (31, "t")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = ef_posting_layout(df, "doc_id", "text").collect()[0]
    assert r["tok"] == "t" and r["ef_bits"] == 20


def _py_rm3(texts, terms, mu=2000.0, fb_docs=10, fb_terms=10,
            lam_ppm=500_000, k=20):
    """Pure-Python replay of the pinned RM3 contract (see
    operators/search._rm3_model): returns (model_terms, topk)."""
    toks = [_tok(t) for t in texts]
    total = sum(len(d) for d in toks)
    vocab_ctf = {}
    for d in toks:
        for t in d:
            vocab_ctf[t] = vocab_ctf.get(t, 0) + 1
    ctf = {t: vocab_ctf.get(t, 0) for t in terms}
    # 1) initial retrieval: Dirichlet product, ctf==0 -> factor 1
    qlik = {}
    for i, d in enumerate(toks):
        p = 1.0
        for t in terms:
            if ctf[t] > 0:
                p = p * ((d.count(t) + mu * ctf[t] / total) / (len(d) + mu))
        qlik[i] = p
    fb = sorted(qlik.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_docs]
    maxq = max(v for _, v in fb)
    # 2) RM1 in exact integers
    rm1 = {}
    for i, q in fb:
        w_fp = round(q / maxq * 1e12)
        d = toks[i]
        if not d:
            continue
        seen = {}
        for t in d:
            seen[t] = seen.get(t, 0) + 1
        for t, tf in seen.items():
            rm1[t] = rm1.get(t, 0) + (w_fp * tf) // len(d)
    expn = sorted(
        ((t, v) for t, v in rm1.items() if t not in terms and v > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )[:fb_terms]
    s = sum(v for _, v in expn)
    # 3) interpolated model in ppm integers
    model = {t: (0, lam_ppm // len(terms)) for t in terms if ctf[t] > 0}
    for t, v in expn:
        model[t] = (v, ((1_000_000 - lam_ppm) * v) // s)
    # 4) sparse-gain scoring
    c_fp = sum(
        round(w * math.log(mu * vocab_ctf[t] / total))
        for t, (_, w) in model.items()
    )
    w_tot = sum(w for _, w in model.values())
    scores = {}
    for i, d in enumerate(toks):
        gain = 0
        seen = {}
        for t in d:
            seen[t] = seen.get(t, 0) + 1
        for t, (_, w) in model.items():
            tf = seen.get(t, 0)
            if tf > 0:
                pc = vocab_ctf[t] / total
                gain += round(w * math.log((tf + mu * pc) / (mu * pc)))
        scores[i] = gain + c_fp - round(w_tot * math.log(len(d) + mu))
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return model, top


RM3_TEXTS = TEXTS + [
    "spark shuffle partition merge window agg",
    "window frame rows between unbounded preceding",
    "merge into target using source when matched",
    "cats and dogs play in the yard",
    "spark merge window shuffle shuffle shuffle",
]


def test_rm3_expansion_matches_python_oracle(spark):
    from eget_spark.operators.search import rm3_expansion

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RM3_TEXTS)], "doc_id long, text string"
    )
    terms = ["spark", "merge"]
    model, _ = _py_rm3(RM3_TEXTS, terms, fb_docs=5, fb_terms=4)
    got = {
        r["tok"]: (r["rm1_fp"], r["weight_fp"], r["is_original"])
        for r in rm3_expansion(
            df, "doc_id", "text", terms, fb_docs=5, fb_terms=4
        ).collect()
    }
    assert set(got) == set(model)
    for t, (rm1_fp, w_fp) in model.items():
        assert got[t] == (rm1_fp, w_fp, t in terms), t
    # expansion terms carry positive relevance-model mass
    assert all(v[0] > 0 for t, v in got.items() if not v[2])


def test_rm3_topk_matches_python_oracle(spark):
    from eget_spark.operators.search import rm3_topk

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RM3_TEXTS)], "doc_id long, text string"
    )
    terms = ["spark", "merge"]
    _, top = _py_rm3(RM3_TEXTS, terms, fb_docs=5, fb_terms=4, k=8)
    got = [
        (r["doc_id"], r["score_fp"], r["rnk"])
        for r in rm3_topk(
            df, "doc_id", "text", terms, fb_docs=5, fb_terms=4, k=8
        ).orderBy("rnk").collect()
    ]
    assert got == [(i, s, r + 1) for r, (i, s) in enumerate(top)]


def test_rm3_expansion_finds_cooccurring_terms(spark):
    """Terms that co-occur with the query in the feedback docs (shuffle,
    window-frame vocabulary) must enter the model; off-topic vocabulary
    (cats/dogs) must not."""
    from eget_spark.operators.search import rm3_expansion

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RM3_TEXTS)], "doc_id long, text string"
    )
    toks = {
        r["tok"] for r in rm3_expansion(
            df, "doc_id", "text", ["spark", "merge"], fb_docs=5, fb_terms=6
        ).collect()
    }
    assert "shuffle" in toks
    assert "cats" not in toks and "yard" not in toks


def test_rm3_lambda_one_recovers_pure_query_weighting(spark):
    """lambda_ppm=1e6 puts all mass on the original query: expansion
    terms get weight_fp == 0 and the ranking's top doc is the dominant
    query-term doc."""
    from eget_spark.operators.search import rm3_expansion, rm3_topk

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RM3_TEXTS)], "doc_id long, text string"
    )
    model = rm3_expansion(
        df, "doc_id", "text", ["spark"], lambda_ppm=1_000_000
    ).collect()
    assert all(r["weight_fp"] == 0 for r in model if not r["is_original"])
    top = rm3_topk(
        df, "doc_id", "text", ["spark"], lambda_ppm=1_000_000, k=1
    ).collect()
    assert top[0]["doc_id"] == 7  # the all-"spark" doc


def _py_sdm(texts, terms, mu=2000.0, k=20, w_t=0.85, w_o=0.10, w_u=0.05,
            window=8):
    toks = [_tok(t) for t in texts]
    sumdl = sum(len(d) for d in toks)
    pairs = list(zip(terms, terms[1:]))

    def counts(d):
        tf = [d.count(t) for t in terms]
        o, u = [], []
        for a, b in pairs:
            o.append(sum(1 for i in range(len(d) - 1)
                         if d[i] == a and d[i + 1] == b))
            pa = [i for i, x in enumerate(d) if x == a]
            pb = [i for i, x in enumerate(d) if x == b]
            u.append(sum(1 for i in pa for j in pb
                         if j != i and abs(j - i) <= window - 1))
        return tf + o + u

    percol = [counts(d) for d in toks]
    nf = len(terms) + 2 * len(pairs)
    cf = [sum(pc[f] for pc in percol) for f in range(nf)]
    wts = [w_t] * len(terms) + [w_o] * len(pairs) + [w_u] * len(pairs)
    out = {}
    for i, d in enumerate(toks):
        s = 0.0
        for f in range(nf):
            if cf[f] == 0:
                continue
            s += wts[f] * math.log(
                (percol[i][f] + mu * cf[f] / sumdl) / (len(d) + mu)
            )
        out[i] = round(s, 6)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


SDM_TEXTS = TEXTS + [
    "spark window functions rank rows over partitions",   # phrase "spark window"
    "window spark separated by nothing else here",         # unordered only
    "spark is fast and window is elsewhere in this rather long doc merge",
]


def test_sdm_matches_python_oracle(spark):
    from eget_spark.operators.search import sdm_topk

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SDM_TEXTS)], "doc_id long, text string"
    )
    terms = ["spark", "window"]
    want = _py_sdm(SDM_TEXTS, terms, k=11)
    got = [
        (r["doc_id"], r["score"])
        for r in sdm_topk(df, "doc_id", "text", terms, k=11)
        .orderBy("rnk").collect()
    ]
    assert got == want


def test_sdm_phrase_beats_scattered_cooccurrence(spark):
    """With equal term frequencies, the doc containing the exact phrase
    must outscore the doc where the terms are far apart (ordered +
    unordered features fire vs neither)."""
    from eget_spark.operators.search import sdm_topk

    texts = [
        "spark window aggregation is the feature",          # phrase
        "spark one two three four five six seven window",   # >8 apart
        "unrelated filler text entirely",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["rnk"]
        for r in sdm_topk(df, "doc_id", "text", ["spark", "window"]).collect()
    }
    assert got[0] < got[1]


def test_sdm_unordered_window_counts_both_directions(spark):
    """'window spark' (reversed, adjacent) fires the unordered feature
    but not the ordered one — it must outscore a doc with the same tf
    where the terms sit outside the window."""
    from eget_spark.operators.search import sdm_topk

    texts = [
        "window spark and some other words",
        "spark a b c d e f g h i j k window",
        "padding doc so collection stats differ from zero",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["rnk"]
        for r in sdm_topk(df, "doc_id", "text", ["spark", "window"]).collect()
    }
    assert got[0] < got[1]
