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
