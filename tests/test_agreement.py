"""Cohen's kappa vs a pure-Python replay."""

from __future__ import annotations

from collections import Counter


def _py_kappa(rows):
    pairs = [(a, b) for a, b in rows if a is not None and b is not None]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    pe_num = sum(ma[c] * mb.get(c, 0) for c in ma)
    po = round(agree / n, 6)
    pe = round(pe_num / (n * n), 6)
    kappa = round((po - pe) / (1 - pe), 6) if pe < 1.0 else None
    return (n, agree, po, pe, kappa)


ROWS = (
    [("good", "good")] * 20
    + [("bad", "bad")] * 10
    + [("good", "bad")] * 4
    + [("bad", "good")] * 2
    + [("spam", "spam")] * 3
    + [("spam", "good")] * 1
)


def _run(spark, rows):
    from eget_spark.operators.agreement import cohens_kappa

    df = spark.createDataFrame(rows, "label_a string, label_b string")
    r = cohens_kappa(df).collect()[0]
    return (r["n_items"], r["agree"], r["po"], r["pe"], r["kappa"])


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_kappa(ROWS)


def test_perfect_agreement_is_one(spark):
    rows = [("a", "a")] * 5 + [("b", "b")] * 5
    assert _run(spark, rows)[4] == 1.0


def test_chance_level_is_zero(spark):
    # independent raters, balanced margins: po == pe == 0.5 -> kappa 0
    rows = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]
    n, agree, po, pe, kappa = _run(spark, rows)
    assert (po, pe, kappa) == (0.5, 0.5, 0.0)


def test_single_label_degenerate_is_null(spark):
    # pe == 1: chance explains everything, kappa undefined
    rows = [("a", "a")] * 4
    assert _run(spark, rows)[4] is None


def test_null_labels_dropped(spark):
    rows = ROWS + [(None, "good"), ("bad", None)]
    assert _run(spark, rows) == _py_kappa(ROWS)


def test_disjoint_label_spaces(spark):
    # raters never use the same label: agree 0, pe 0, kappa 0
    rows = [("x", "y")] * 6
    n, agree, po, pe, kappa = _run(spark, rows)
    assert (agree, po, pe, kappa) == (0, 0.0, 0.0, 0.0)


# --- Fleiss' kappa ----------------------------------------------------------

def _py_fleiss(rows, m=3):
    from collections import Counter, defaultdict

    items = defaultdict(Counter)
    for i, c in rows:
        if c is not None:
            items[i][c] += 1
    valid = {i: cnt for i, cnt in items.items()
             if sum(cnt.values()) == m}
    n_dropped = len(items) - len(valid)
    n = len(valid)
    agree_num = sum(
        sum(v * v for v in cnt.values()) - m for cnt in valid.values()
    )
    marg = Counter()
    for cnt in valid.values():
        marg.update(cnt)
    pe_num = sum(v * v for v in marg.values())
    po = round(agree_num / (n * m * (m - 1)), 6)
    nm = float(n * m)
    pe = round(pe_num / (nm * nm), 6)
    kappa = round((po - pe) / (1 - pe), 6) if pe < 1.0 else None
    return (n, n_dropped, po, pe, kappa)


FLEISS_ROWS = (
    [(i, "good") for i in range(10) for _ in range(3)]          # unanimous
    + [(100 + i, lab) for i in range(6)
       for lab in ("good", "bad", "spam")]                      # max split
    + [(200, "good"), (200, "good"), (200, "bad")]              # 2-1
    + [(300, "good"), (300, "bad")]                             # m=2: dropped
)


def _run_fleiss(spark, rows, m=3):
    from eget_spark.operators.agreement import fleiss_kappa

    df = spark.createDataFrame(rows, "item long, label string")
    r = fleiss_kappa(df, "item", "label", m=m).collect()[0]
    return (r["n_items"], r["n_dropped"], r["po"], r["pe"], r["kappa"])


def test_fleiss_matches_python_replay(spark):
    assert _run_fleiss(spark, FLEISS_ROWS) == _py_fleiss(FLEISS_ROWS)


def test_fleiss_unanimous_is_one(spark):
    rows = [(i, "a") for i in range(4) for _ in range(3)] + [
        (10 + i, "b") for i in range(4) for _ in range(3)
    ]
    assert _run_fleiss(spark, rows)[4] == 1.0


def test_fleiss_wrong_vote_count_dropped_and_reported(spark):
    got = _run_fleiss(spark, FLEISS_ROWS)
    assert got[1] == 1  # item 300 has only 2 votes


# --- Krippendorff's alpha ---------------------------------------------------

def _py_kripp(rows):
    from collections import Counter, defaultdict

    items = defaultdict(Counter)
    for i, c in rows:
        if c is not None:
            items[i][c] += 1
    valid = {i: cnt for i, cnt in items.items()
             if sum(cnt.values()) >= 2}
    n_items = len(valid)
    n = sum(sum(c.values()) for c in valid.values())
    do = 0
    for cnt in valid.values():
        mi = sum(cnt.values())
        dis = mi * mi - sum(v * v for v in cnt.values())
        do += dis * 10**6 // (mi - 1)
    marg = Counter()
    for cnt in valid.values():
        marg.update(cnt)
    de = n * n - sum(v * v for v in marg.values())
    alpha = (round(1.0 - ((n - 1) * do) / (de * 1e6), 6)
             if de > 0 else None)
    return (n_items, n, do, de, alpha)


KRIPP_ROWS = (
    [(1, "a"), (1, "a"), (1, "a")]       # 3 votes, unanimous
    + [(2, "a"), (2, "b")]               # 2 votes, split
    + [(3, "b"), (3, "b"), (3, "b"), (3, "a")]  # 4 votes, 3-1
    + [(4, "c")]                         # 1 vote: excluded
)


def _run_kripp(spark, rows):
    from eget_spark.operators.agreement import krippendorff_alpha

    df = spark.createDataFrame(rows, "item long, label string")
    r = krippendorff_alpha(df, "item", "label").collect()[0]
    return (r["n_items"], r["n_votes"], r["do_micro"], r["de_num"],
            r["alpha"])


def test_kripp_matches_python_replay(spark):
    assert _run_kripp(spark, KRIPP_ROWS) == _py_kripp(KRIPP_ROWS)


def test_kripp_single_vote_items_excluded(spark):
    got = _run_kripp(spark, KRIPP_ROWS)
    assert got[0] == 3 and got[1] == 9


def test_kripp_perfect_agreement_is_one(spark):
    rows = [(1, "a")] * 3 + [(2, "b")] * 3
    assert _run_kripp(spark, rows)[4] == 1.0


def test_kripp_degenerate_single_label_is_null(spark):
    rows = [(1, "a")] * 3 + [(2, "a")] * 2
    assert _run_kripp(spark, rows)[4] is None
