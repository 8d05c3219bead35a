"""Conformal novelty p-values vs a pure-Python replay + the
finite-sample validity guarantee checked empirically."""

from __future__ import annotations


def _py_conformal(ref_scores, batch, alpha_ppm=50_000):
    n = len(ref_scores)
    out = {}
    for did, s in batch:
        cnt = sum(1 for r in ref_scores if r >= s)
        p = (1 + cnt) * 1_000_000 // (n + 1)
        out[did] = (s, cnt, p, p <= alpha_ppm)
    return out


def _run(spark, ref_scores, batch, **kw):
    from eget_spark.operators.conformal import conformal_pvalues

    ref = spark.createDataFrame(
        [(s,) for s in ref_scores], "score long"
    )
    bat = spark.createDataFrame(batch, "doc_id long, score long")
    out = conformal_pvalues(ref, bat, "doc_id", "score", **kw).collect()
    return {
        r["id"]: (r["score"], r["cnt_ge"], r["p_ppm"], r["novel"])
        for r in out
    }


REF = [100 + (i * 7) % 40 for i in range(300)]
BATCH = (
    [(i, 100 + (i * 11) % 40) for i in range(40)]      # in-distribution
    + [(100 + i, 200 + i) for i in range(5)]           # clear outliers
)


def test_matches_python_replay(spark):
    assert _run(spark, REF, BATCH) == _py_conformal(REF, BATCH)


def test_outliers_flagged_indist_not(spark):
    got = _run(spark, REF, BATCH)
    # every score beyond the reference support is maximally novel
    for i in range(5):
        s, cnt, p, novel = got[100 + i]
        assert cnt == 0 and novel and p == 1_000_000 // 301
    # in-distribution points: only the distribution's own extreme tail
    # may flag at 5% (score 139 = the reference maximum, 8/300 above it
    # — a correct 2.99% p-value), nothing else
    flagged = [i for i in range(40) if got[i][3]]
    assert all(got[i][0] == 139 for i in flagged)


def test_validity_under_exchangeability(spark):
    """Scoring the reference's own distribution: the fraction with
    p <= alpha is at most ~alpha (the conformal guarantee)."""
    batch = [(i, REF[i]) for i in range(len(REF))]
    got = _run(spark, REF, batch, alpha_ppm=100_000)
    frac = sum(1 for v in got.values() if v[3]) / len(got)
    assert frac <= 0.11
    assert got == _py_conformal(REF, batch, alpha_ppm=100_000)


def test_below_support_reads_full_count(spark):
    got = _run(spark, REF, [(1, 100)], min_score=0)
    s, cnt, p, novel = got[1]
    # the minimum reference value: every reference score >= it
    assert cnt == len(REF) and p == 1_000_000 and not novel


def test_empty_reference_p_is_one(spark):
    got = _run(spark, [], [(1, 42)])
    assert got[1] == (42, 0, 1_000_000, False)
