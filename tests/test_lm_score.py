"""Unigram-LM document scoring vs a Python oracle."""

from __future__ import annotations

import math
import re
from collections import Counter


def _tok(t: str) -> list[str]:
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _oracle(train: list[str], score: list[tuple[str, str]]):
    c = Counter()
    for t in train:
        c.update(_tok(t))
    n, v = sum(c.values()), len(c)
    out = {}
    for did, t in score:
        ts = _tok(t)
        if not ts:
            out[did] = (0, None)
        else:
            s = sum(math.log((c[x] + 1) / (n + v)) for x in ts) / len(ts)
            out[did] = (len(ts), round(s, 6))
    return out


DOCS = [
    ("prose", "The cat sat on the mat and the cat was very happy there."),
    ("gibberish", "zxqv qzxw vvvv zzzz xkcd qqqq!!!"),
    ("empty", ""),
    ("punct", "?!... --- ###"),
    ("mixed", "The zxqv cat."),
    ("repeat", "the the the the"),
]


def test_self_scored_matches_python_oracle(spark):
    from eget_spark.operators.lm_score import unigram_doc_scores

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    want = _oracle([t for _, t in DOCS], DOCS)
    got = {r["id"]: r for r in unigram_doc_scores(df).collect()}
    assert len(got) == len(DOCS)
    for did, (wn, ws) in want.items():
        r = got[did]
        assert r["n_tokens"] == wn, did
        if ws is None:
            assert r["lm_score"] is None, did
        else:
            assert abs(r["lm_score"] - ws) < 1e-9, (did, r["lm_score"], ws)
    # the filter's whole point: prose scores above gibberish
    assert got["prose"]["lm_score"] > got["gibberish"]["lm_score"]


def test_external_lm_floors_unseen_tokens(spark):
    from eget_spark.operators.lm_score import unigram_doc_scores, unigram_lm

    train = ["the cat sat", "the dog ran", "the cat ran"]
    tdf = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(train)], "doc_id string, text string"
    )
    lm = unigram_lm(tdf, "doc_id", "text")
    score_docs = [("in", "the cat"), ("out", "zzz qqq"), ("half", "the zzz")]
    sdf = spark.createDataFrame(score_docs, "doc_id string, text string")
    got = {r["id"]: r for r in unigram_doc_scores(sdf, lm=lm).collect()}

    c = Counter()
    for t in train:
        c.update(_tok(t))
    n, v = sum(c.values()), len(c)
    floor = math.log(1 / (n + v))
    for did, t in score_docs:
        ts = _tok(t)
        s = sum(
            math.log((c[x] + 1) / (n + v)) if x in c else floor for x in ts
        ) / len(ts)
        assert abs(got[did]["lm_score"] - round(s, 6)) < 1e-9, did
    assert got["out"]["lm_score"] == round(floor, 6)
    assert got["in"]["lm_score"] > got["half"]["lm_score"] > got["out"]["lm_score"]


def test_lm_plan_map_side_combined_no_python(spark):
    from eget_spark.operators.lm_score import unigram_doc_scores

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    plan = (
        unigram_doc_scores(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # both the vocab count and the doc-token reduction partial-combine
    # map-side (the Zipf hot-token medicine)
    assert "partial_count" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan  # scalars ride a broadcast


def test_bigram_stupid_backoff_matches_python_oracle(spark):
    import math
    import re

    from eget_spark.operators.lm_score import bigram_doc_scores

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat ate the fish",
        "a completely unseen zebra sentence",
        "cat",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    train_ids = [0, 1]
    got = {
        r["id"]: (r["n_bigrams"], r["lm2_score"])
        for r in bigram_doc_scores(df, df.where(df.doc_id.isin(train_ids))).collect()
    }

    tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for i in train_ids:
        ts = tok(texts[i])
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    t_total = sum(uni.values())
    for i, text in enumerate(texts):
        ts = tok(text)
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            assert got[i] == (0, None)
            continue
        lps = []
        for a, b in pairs:
            if bi.get((a, b), 0) > 0:
                lps.append(math.log(bi[(a, b)] / uni[a]))
            else:
                lps.append(math.log(0.4 * (uni.get(b, 0) + 0.5) / (t_total + 1.0)))
        assert got[i] == (len(pairs), round(sum(lps) / len(pairs), 6))


def test_bigram_seen_scores_above_backoff(spark):
    from eget_spark.operators.lm_score import bigram_doc_scores

    texts = ["alpha beta gamma delta", "alpha beta gamma delta", "zeta eta theta iota"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    scores = {
        r["id"]: r["lm2_score"]
        for r in bigram_doc_scores(df, df.where(df.doc_id < 2)).collect()
    }
    # in-domain doc outscores the fully-OOV doc
    assert scores[0] > scores[2]


def test_kneser_ney_matches_python_oracle(spark):
    import math
    import re
    from collections import Counter

    from eget_spark.operators.lm_score import kneser_ney_doc_scores

    train_texts = {
        1: "the cat sat on the mat",
        2: "the dog sat on the rug",
        3: "a cat and a dog",
    }
    held_texts = {
        10: "the cat sat",          # all bigrams seen
        11: "the zebra ran",        # unseen continuation + unseen context
        12: "cat",                  # < 2 tokens
    }

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    bi = Counter()
    for t in train_texts.values():
        ws = toks(t)
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    c1 = Counter()
    n1fwd = Counter()
    n1w = Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        n1fwd[a] += 1
        n1w[b] += 1
    btypes = len(bi)
    D = 0.75

    def pkn(v, w):
        pc = max(2 * n1w.get(w, 0), 1) / (2.0 * btypes)
        if v in c1:
            return (
                max(bi.get((v, w), 0) - D, 0.0) / c1[v]
                + D * n1fwd[v] / c1[v] * pc
            )
        return pc

    def score(t):
        ws = toks(t)
        if len(ws) < 2:
            return 0, 0, None
        total = 0
        for a, b in zip(ws, ws[1:]):
            total += round(math.log(pkn(a, b)) * 1e6)
        n = len(ws) - 1
        return n, total, round(total / 1e6 / n, 6)

    train = spark.createDataFrame(
        list(train_texts.items()), "doc_id long, text string"
    )
    held = spark.createDataFrame(
        list(held_texts.items()), "doc_id long, text string"
    )
    got = {
        r.id: (r.n_bigrams, r.kn_sum_micro, r.kn_mean)
        for r in kneser_ney_doc_scores(held, train).collect()
    }
    for did, text in held_texts.items():
        assert got[did] == score(text), f"doc {did}"
    # seen bigrams must outrank the unseen-token doc
    assert got[10][2] > got[11][2]


def test_kneser_ney_probabilities_sum_to_one(spark):
    """For a seen context v, sum over the TRAINING VOCABULARY of
    P_KN(w|v) is 1 when every w has n1w >= 1 (the floor only triggers
    off-vocabulary): the discount mass exactly funds the continuation
    interpolation."""
    import re
    from collections import Counter

    train_texts = ["b a b c a b", "c b a a c"]
    bi = Counter()
    for t in train_texts:
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    c1 = Counter()
    n1fwd = Counter()
    n1w = Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        n1fwd[a] += 1
        n1w[b] += 1
    btypes = len(bi)
    D = 0.75
    vocab = sorted({w for pair in bi for w in pair})
    assert all(n1w.get(w, 0) >= 1 for w in vocab)
    for v in c1:
        s = sum(
            max(bi.get((v, w), 0) - D, 0.0) / c1[v]
            + D * n1fwd[v] / c1[v] * (n1w[w] / btypes)
            for w in vocab
        )
        assert abs(s - 1.0) < 1e-9


def test_moore_lewis_matches_python_oracle(spark):
    import math
    import re
    from collections import Counter

    from eget_spark.operators.lm_score import moore_lewis_scores

    pool = {
        1: ("en", "the cat sat on the mat"),
        2: ("en", "the dog sat on the rug"),
        3: ("fr", "le chat et le chien"),
        4: ("fr", "la maison est grande"),
        5: ("en", ""),
    }

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    c_i = Counter(w for lang, t in pool.values() if lang == "en" for w in toks(t))
    c_o = Counter(w for _, t in pool.values() for w in toks(t))
    ni, vi = sum(c_i.values()), len(c_i)
    no, vo = sum(c_o.values()), len(c_o)

    def lr_micro(w):
        lpi = (
            math.log((c_i[w] + 1.0) / (ni + vi))
            if w in c_i
            else math.log(1.0 / (ni + vi))
        )
        lpo = math.log((c_o[w] + 1.0) / (no + vo))
        return round((lpi - lpo) * 1e6)

    def score(t):
        ws = toks(t)
        if not ws:
            return 0, 0, None
        total = sum(lr_micro(w) for w in ws)
        return len(ws), total, round(total / 1e6 / len(ws), 6)

    df = spark.createDataFrame(
        [(i, lang, t) for i, (lang, t) in pool.items()],
        "doc_id long, lang string, text string",
    )
    got = {
        r.id: (r.n_tokens, r.ml_sum_micro, r.ml_mean)
        for r in moore_lewis_scores(
            df, df.where("lang = 'en'")
        ).collect()
    }
    for did, (_, text) in pool.items():
        assert got[did] == score(text), f"doc {did}"
    # in-domain (en) docs outrank the out-of-domain (fr) docs
    assert min(got[1][2], got[2][2]) > max(got[3][2], got[4][2])


def test_moore_lewis_self_domain_is_zero(spark):
    """When the in-domain corpus IS the pool, both LMs coincide and
    every log-ratio is exactly 0 — the cross-entropy difference of
    identical models."""
    from eget_spark.operators.lm_score import moore_lewis_scores

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta delta")],
        "doc_id long, text string",
    )
    got = moore_lewis_scores(df, df).collect()
    assert all(r.ml_sum_micro == 0 and r.ml_mean == 0.0 for r in got)


def test_witten_bell_matches_python_oracle(spark):
    import math
    import re
    from collections import Counter

    from eget_spark.operators.lm_score import witten_bell_doc_scores

    train_texts = {
        1: "the cat sat on the mat",
        2: "the dog sat on the rug",
        3: "a cat and a dog",
    }
    held_texts = {
        10: "the cat sat",       # all bigrams seen
        11: "the zebra ran",     # unseen continuation + unseen context
        12: "cat",               # < 2 tokens
    }

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    bi = Counter()
    uni = Counter()
    for t in train_texts.values():
        ws = toks(t)
        uni.update(ws)
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    c1 = Counter()
    t_v = Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        t_v[a] += 1
    n_tot = sum(uni.values())
    v_size = len(uni)

    def pwb(v, w):
        pu = (uni.get(w, 0) + 1.0) / (n_tot + v_size)
        if v in c1:
            return (bi.get((v, w), 0) + t_v[v] * pu) / (c1[v] + t_v[v])
        return pu

    def score(t):
        ws = toks(t)
        if len(ws) < 2:
            return 0, 0, None
        total = sum(
            round(math.log(pwb(a, b)) * 1e6) for a, b in zip(ws, ws[1:])
        )
        n = len(ws) - 1
        return n, total, round(total / 1e6 / n, 6)

    train = spark.createDataFrame(
        list(train_texts.items()), "doc_id long, text string"
    )
    held = spark.createDataFrame(
        list(held_texts.items()), "doc_id long, text string"
    )
    got = {
        r.id: (r.n_bigrams, r.wb_sum_micro, r.wb_mean)
        for r in witten_bell_doc_scores(held, train).collect()
    }
    for did, text in held_texts.items():
        assert got[did] == score(text), f"doc {did}"
    assert got[10][2] > got[11][2]


def test_witten_bell_probabilities_sum_to_one(spark):
    """For a seen context v, P_WB(w|v) summed over the event space is 1
    when the unigram fallback itself sums to 1 over that space — WB is a
    proper interpolation (lambda = c1/(c1+T), 1-lambda = T/(c1+T))."""
    import re
    from collections import Counter

    train_texts = ["b a b c a b", "c b a a c"]
    bi = Counter()
    uni = Counter()
    for t in train_texts:
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        uni.update(ws)
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    c1 = Counter()
    t_v = Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        t_v[a] += 1
    n_tot, v_size = sum(uni.values()), len(uni)
    # event space: vocab + one OOV symbol sharing the add-one floor mass
    vocab = sorted(uni)
    pu = {w: (uni[w] + 1.0) / (n_tot + v_size) for w in vocab}
    pu_mass = sum(pu.values())  # < 1 (the rest is OOV floor mass)
    for v in c1:
        s = sum(
            (bi.get((v, w), 0) + t_v[v] * pu[w]) / (c1[v] + t_v[v])
            for w in vocab
        )
        # sum over vocab = (c1 + T*pu_mass)/(c1+T) -> 1 as pu_mass -> 1
        want = (c1[v] + t_v[v] * pu_mass) / (c1[v] + t_v[v])
        assert abs(s - want) < 1e-9


def test_ccnet_tertiles_buckets_and_labels(spark):
    from eget_spark.operators.lm_score import ccnet_tertiles

    rows = [
        # en: 6 docs — common words score high, rare-word docs low
        (1, "en", "the the the cat"),
        (2, "en", "the cat the dog"),
        (3, "en", "the dog ran far"),
        (4, "en", "zyx wvu tsr qpo"),
        (5, "en", "the the the the"),
        (6, "en", "cat dog ran the"),
        # fr: 3 docs
        (7, "fr", "le le chat"),
        (8, "fr", "le chien"),
        (9, "fr", "xyz abc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.id: (r.lang, r.bucket, r.label)
        for r in ccnet_tertiles(df).collect()
    }
    assert len(got) == 9
    # each language buckets independently: en has 2 docs per tertile,
    # fr has 1 per tertile
    from collections import Counter

    en = Counter(b for lang, b, _ in got.values() if lang == "en")
    fr = Counter(b for lang, b, _ in got.values() if lang == "fr")
    assert en == {1: 2, 2: 2, 3: 2}
    assert fr == {1: 1, 2: 1, 3: 1}
    # the all-"the" doc is the en head; the gibberish doc is the tail
    assert got[5] == ("en", 1, "head")
    assert got[4][1] == 3 and got[4][2] == "tail"
    assert got[9] == ("fr", 3, "tail")


def test_ccnet_tertiles_empty_doc_ranks_tail(spark):
    from eget_spark.operators.lm_score import ccnet_tertiles

    df = spark.createDataFrame(
        [(1, "en", "the cat"), (2, "en", "the dog"), (3, "en", "")],
        "doc_id long, lang string, text string",
    )
    got = {r.id: (r.bucket, r.lm_score) for r in ccnet_tertiles(df).collect()}
    assert got[3] == (3, None)
