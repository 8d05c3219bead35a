"""G-test, k-anonymity, Hill tail index, info gain vs Python replays."""

from __future__ import annotations

import math
from collections import Counter, defaultdict


# --- G-test ------------------------------------------------------------------

def _py_gtest(rows):
    cells = Counter(rows)
    rm = Counter()
    cm = Counter()
    for (r, c), o in cells.items():
        rm[r] += o
        cm[c] += o
    n = sum(cells.values())
    dof = (len(rm) - 1) * (len(cm) - 1)
    out = []
    for (r, c), o in cells.items():
        lr = round(math.log((o * float(n)) / (rm[r] * float(cm[c]))) * 1e6)
        out.append([r, c, o, rm[r] * cm[c] * 1000 // n, 2 * o * lr, dof])
    g_tot = sum(t[4] for t in out)
    return sorted((r, c, o, e, g, g_tot, d) for r, c, o, e, g, d in out)


GT_ROWS = (
    [("blog", "keep")] * 40 + [("blog", "drop")] * 10
    + [("forum", "keep")] * 15 + [("forum", "drop")] * 35
    + [("news", "keep")] * 25 + [("news", "drop")] * 25
)


def _run_gtest(spark, rows):
    from eget_spark.operators.audit import contingency_gtest

    df = spark.createDataFrame(rows, "source string, label string")
    out = contingency_gtest(df, "source", "label").collect()
    return [(r["r"], r["c"], r["obs"], r["exp_milli"], r["g_micro"],
             r["g_total_micro"], r["dof"]) for r in out]


def test_gtest_matches_python_replay(spark):
    assert _run_gtest(spark, GT_ROWS) == _py_gtest(GT_ROWS)


def test_gtest_independent_table_near_zero(spark):
    rows = ([("a", "x")] * 20 + [("a", "y")] * 10
            + [("b", "x")] * 40 + [("b", "y")] * 20)
    got = _run_gtest(spark, rows)
    assert all(abs(r[4]) <= 2 for r in got)  # quantization dust only
    assert got[0][6] == 1


def test_gtest_dependence_is_large(spark):
    assert _run_gtest(spark, GT_ROWS)[0][5] > 10_000_000  # G >> dof


# --- k-anonymity -------------------------------------------------------------

def _py_kanon(rows, k=5):
    sizes = Counter(rows)
    n = sum(sizes.values())
    below = {t: s for t, s in sizes.items() if s < k}
    rb = sum(below.values())
    return (n, len(sizes), min(sizes.values()), len(below), rb,
            rb * 10**6 // n)


KA_ROWS = ([("h1", "en")] * 20 + [("h1", "de")] * 3 + [("h2", "en")] * 7
           + [("h3", "fr")] * 1 + [("h3", "en")] * 4)


def _run_kanon(spark, rows, k=5):
    from eget_spark.operators.audit import k_anonymity_audit

    df = spark.createDataFrame(rows, "host string, lang string")
    r = k_anonymity_audit(df, ["host", "lang"], k=k).collect()[0]
    return (r["n_rows"], r["n_classes"], r["k_anonymity"],
            r["n_classes_below_k"], r["rows_below_k"], r["suppress_ppm"])


def test_kanon_matches_python_replay(spark):
    assert _run_kanon(spark, KA_ROWS) == _py_kanon(KA_ROWS)


def test_kanon_all_unique_is_worst_case(spark):
    rows = [(f"h{i}", "en") for i in range(6)]
    got = _run_kanon(spark, rows, k=2)
    assert got[2] == 1 and got[5] == 10**6


def test_kanon_threshold_boundary(spark):
    # classes of exactly k are NOT below k
    rows = [("h", "en")] * 5
    assert _run_kanon(spark, rows, k=5)[3] == 0


# --- Hill tail index ---------------------------------------------------------

def _py_hill(values, k=100):
    xs = sorted((v for v in values if v > 0), reverse=True)[: k + 1]
    thr = xs[-1]
    terms = [round(math.log(x / float(thr)) * 1e6) for x in xs]
    # drop one threshold-valued row (the k+1-st order statistic)
    drop = next(i for i, x in enumerate(xs) if x == thr)
    terms.pop(drop)
    kk = len(terms)
    s = sum(terms)
    alpha = round(kk * 1e6 / float(s), 6) if s > 0 else None
    return (kk, thr, s, alpha)


def _run_hill(spark, values, k=100):
    from eget_spark.operators.corpus_stats import hill_tail_index

    df = spark.createDataFrame([(v,) for v in values], "n_chars long")
    r = hill_tail_index(df, "n_chars", k=k).collect()[0]
    return (r["k"], r["x_threshold"], r["sum_micro"], r["alpha"])


HILL_VALS = [int(10000 / (i + 1) ** 0.5) for i in range(400)] + [0, -5]


def test_hill_matches_python_replay(spark):
    assert _run_hill(spark, HILL_VALS, k=50) == _py_hill(HILL_VALS, k=50)


def test_hill_pareto_alpha_near_two(spark):
    # x_i ~ c * i^(-1/2) is Pareto with alpha = 2
    got = _run_hill(spark, HILL_VALS, k=50)
    assert 1.5 < got[3] < 2.5


def test_hill_constant_tail_null(spark):
    assert _run_hill(spark, [7] * 30, k=10)[3] is None


# --- information gain --------------------------------------------------------

def _py_ig(rows, feats):
    n = len(rows)
    out = []
    for f in feats:
        cells = Counter((r[f], r["lbl"]) for r in rows)
        vm = Counter()
        lmc = Counter()
        for (v, l), o in cells.items():
            vm[v] += o
            lmc[l] += o
        h = sum(round(-1e6 * (c / n) * math.log(c / n))
                for c in lmc.values())
        hc = sum(round(1e6 * (o / n) * math.log(vm[v] / o))
                 for (v, l), o in cells.items())
        ig = sum(
            round(1e6 * (o / n)
                  * math.log((o * float(n)) / (vm[v] * float(lmc[l]))))
            for (v, l), o in cells.items()
        )
        out.append((f, len(vm), h, hc, ig))
    return sorted(out, key=lambda r: (-r[4], r[0]))


IG_ROWS = (
    [{"lang": "en", "source": "a", "lbl": "keep"}] * 30
    + [{"lang": "en", "source": "b", "lbl": "keep"}] * 10
    + [{"lang": "de", "source": "a", "lbl": "drop"}] * 25
    + [{"lang": "de", "source": "b", "lbl": "keep"}] * 5
    + [{"lang": "fr", "source": "a", "lbl": "drop"}] * 10
)


def _run_ig(spark, rows):
    from eget_spark.operators.features import info_gain

    df = spark.createDataFrame(
        [(r["lang"], r["source"], r["lbl"]) for r in rows],
        "lang string, source string, lbl string",
    )
    out = info_gain(df, ["lang", "source"], "lbl").collect()
    return [(r["feature"], r["n_values"], r["h_label_micro"],
             r["h_cond_micro"], r["ig_micro"]) for r in out]


def test_ig_matches_python_replay(spark):
    assert _run_ig(spark, IG_ROWS) == _py_ig(IG_ROWS, ["lang", "source"])


def test_informative_feature_ranks_first(spark):
    out = _run_ig(spark, IG_ROWS)
    assert out[0][0] == "lang" and out[0][4] > out[1][4]


def test_ig_bounded_by_label_entropy(spark):
    for r in _run_ig(spark, IG_ROWS):
        assert 0 <= r[4] <= r[2] + 2  # quantization dust allowance
