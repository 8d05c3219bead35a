"""Per-group unigram divergence vs a pure-Python replay."""

from __future__ import annotations

import math
import re

TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


def _toks(text):
    return [t for t in TOKEN_SPLIT.split(text.lower()) if t]


def _py_divergences(rows):
    gt: dict[tuple[str, str], int] = {}
    for grp, text in rows:
        for t in _toks(text):
            gt[(grp, t)] = gt.get((grp, t), 0) + 1
    n_g: dict[str, int] = {}
    n_t: dict[str, int] = {}
    for (g, t), k in gt.items():
        n_g[g] = n_g.get(g, 0) + k
        n_t[t] = n_t.get(t, 0) + k
    n = sum(n_t.values())
    out = {}
    for (g, t), k in gt.items():
        p = k / n_g[g]
        q = n_t[t] / n
        a = out.setdefault(g, [0, 0, 0, 0, 0])
        a[0] += k
        a[1] += 1
        a[2] += round(-p * math.log(p) * 1e6)
        a[3] += round(-p * math.log(q) * 1e6)
        a[4] += round(p * math.log(p / q) * 1e6)
    return sorted((g, *v) for g, v in out.items())


def _run(spark, rows):
    from eget_spark.operators.divergence import group_divergences

    df = spark.createDataFrame(rows, "source string, text string")
    out = group_divergences(df, "source", "text").collect()
    return [
        (r["source"], r["n_toks"], r["n_types"], r["h_micro"], r["ce_micro"],
         r["kl_micro"])
        for r in out
    ]


ROWS = [
    ("news", "stocks fell on tuesday as markets weighed inflation data"),
    ("news", "the central bank held rates steady citing inflation"),
    ("forum", "lol that build is so broken buff the mage nerf the rogue"),
    ("forum", "anyone else stuck on the boss fight lol"),
    ("docs", "the function returns a dataframe partitioned by key"),
]


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_divergences(ROWS)


def test_single_group_has_zero_kl(spark):
    rows = [("only", "a b c a b"), ("only", "c a d")]
    out = _run(spark, rows)
    assert len(out) == 1
    g, n_toks, n_types, h, ce, kl = out[0]
    # one group IS the corpus: p == q for every token
    assert kl == 0 and ce == h and n_toks == 8 and n_types == 4


def test_identical_groups_have_zero_kl(spark):
    rows = [("a", "x y z x"), ("b", "x y z x")]
    for g, n_toks, n_types, h, ce, kl in _run(spark, rows):
        assert kl == 0 and ce == h


def test_disjoint_group_has_positive_kl(spark):
    rows = [("a", "x x x x"), ("b", "y y y y"), ("b", "y y y y")]
    out = {r[0]: r for r in _run(spark, rows)}
    # group a: p(x)=1, q(x)=4/12 -> KL = ln(3)
    assert out["a"][5] == round(math.log(3) * 1e6)
    assert out["b"][5] == round(math.log(12 / 8) * 1e6)


# --- pairwise JSD ------------------------------------------------------------

LN2_MICRO = 693147


def _py_jsd(rows):
    import math
    import re
    from collections import Counter, defaultdict

    gt: dict[str, Counter] = defaultdict(Counter)
    for g, text in rows:
        for t in re.split(r"[^a-z0-9]+", text.lower()):
            if t:
                gt[g][t] += 1
    groups = sorted(gt)
    out = []
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            ga, gb = groups[i], groups[j]
            na, nb = sum(gt[ga].values()), sum(gt[gb].values())
            shared = sorted(set(gt[ga]) & set(gt[gb]))
            s_micro = sa = sb = 0
            for t in shared:
                ca, cb = gt[ga][t], gt[gb][t]
                p, q = ca / na, cb / nb
                s_micro += round(
                    (p * math.log(2.0 * p / (p + q))
                     + q * math.log(2.0 * q / (p + q))) / 2.0 * 1e6
                )
                sa += ca
                sb += cb
            jsd = (s_micro + (na - sa) * LN2_MICRO // (2 * na)
                   + (nb - sb) * LN2_MICRO // (2 * nb))
            out.append((ga, gb, len(shared), jsd))
    return out


JSD_ROWS = [
    ("news", "the market rose today as traders bought shares"),
    ("news", "shares fell as the market slipped on rate fears"),
    ("mirror", "the market rose today as traders bought shares"),
    ("mirror", "shares fell as the market slipped on rate fears"),
    ("recipes", "whisk eggs with flour and sugar then bake until golden"),
    ("klingon", "qapla batlh tlhingan maH"),
]


def _run_jsd(spark, rows):
    from eget_spark.operators.divergence import pairwise_jsd

    df = spark.createDataFrame(rows, "source string, text string")
    out = pairwise_jsd(df, "source", "text").collect()
    return [
        (r["grp_a"], r["grp_b"], r["n_shared_types"], r["jsd_micro"])
        for r in out
    ]


def test_jsd_matches_python_replay(spark):
    assert _run_jsd(spark, JSD_ROWS) == _py_jsd(JSD_ROWS)


def test_jsd_identical_groups_zero(spark):
    got = {(a, b): j for a, b, _, j in _run_jsd(spark, JSD_ROWS)}
    assert got[("mirror", "news")] == 0


def test_jsd_disjoint_hits_ln2_ceiling(spark):
    got = {(a, b): j for a, b, _, j in _run_jsd(spark, JSD_ROWS)}
    # klingon shares no token with recipes: exactly the two DIV floors
    # below LN2_MICRO... which with sa=sb=0 is ln2/2 + ln2/2
    assert got[("klingon", "recipes")] == (
        LN2_MICRO // 2 + LN2_MICRO // 2
    )


def test_jsd_related_closer_than_unrelated(spark):
    got = {(a, b): j for a, b, _, j in _run_jsd(spark, JSD_ROWS)}
    assert got[("news", "recipes")] > got[("mirror", "news")]
    assert 0 < got[("klingon", "news")] <= LN2_MICRO


def test_jsd_zero_shared_pairs_still_emitted(spark):
    rows = [("a", "alpha beta"), ("b", "gamma delta")]
    got = _run_jsd(spark, rows)
    assert len(got) == 1 and got[0][2] == 0
