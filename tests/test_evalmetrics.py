"""ROC-AUC / AP / nDCG / Kendall tau-b vs pure-Python replays."""

from __future__ import annotations

import math

PPM = 10**6


# --- ROC-AUC + AP ------------------------------------------------------------

def _py_auc_ap(rows):
    n = len(rows)
    npos = sum(y for _, _, y in rows)
    nneg = n - npos
    # ascending midranks (doubled)
    by_s = sorted(rows, key=lambda r: r[1])
    r2 = 0
    i = 0
    while i < n:
        j = i
        while j < n and by_s[j][1] == by_s[i][1]:
            j += 1
        mid2 = (i + 1) + j  # 2 * average of ranks i+1..j
        r2 += sum(mid2 for k in range(i, j) if by_s[k][2] == 1)
        i = j
    auc = (round((r2 - npos * (npos + 1)) / (2.0 * npos * nneg), 6)
           if npos and nneg else None)
    by_desc = sorted(rows, key=lambda r: (-r[1], r[0]))
    tp = 0
    ap_num = 0
    for i, (_, _, y) in enumerate(by_desc, 1):
        if y == 1:
            tp += 1
            ap_num += tp * PPM // i
    ap = ap_num // npos if npos else None
    return (n, npos, nneg, r2, auc, ap)


AUC_ROWS = (
    [(i, 900 + i, 1) for i in range(5)]          # high scores, positive
    + [(10 + i, 500, 1 if i < 2 else 0) for i in range(5)]  # tied block
    + [(20 + i, 100 + i, 0) for i in range(6)]   # low scores, negative
    + [(30, 950, 0)]                             # one hard negative
)


def _run_auc(spark, rows):
    from eget_spark.operators.evalmetrics import roc_auc_ap

    df = spark.createDataFrame(rows, "id long, score long, label long")
    r = roc_auc_ap(df, "score", "label", "id").collect()[0]
    return (r["n"], r["n_pos"], r["n_neg"], r["r2_pos"], r["auc"],
            r["ap_ppm"])


def test_auc_ap_matches_python_replay(spark):
    assert _run_auc(spark, AUC_ROWS) == _py_auc_ap(AUC_ROWS)


def test_perfect_ranker_auc_one(spark):
    rows = [(i, 100 + i, 1) for i in range(3)] + [
        (10 + i, i, 0) for i in range(3)
    ]
    got = _run_auc(spark, rows)
    assert got[4] == 1.0 and got[5] == PPM


def test_inverted_ranker_auc_zero(spark):
    rows = [(i, i, 1) for i in range(3)] + [
        (10 + i, 100 + i, 0) for i in range(3)
    ]
    assert _run_auc(spark, rows)[4] == 0.0


def test_tied_scores_use_midranks(spark):
    # every score identical: AUC exactly 0.5 by the midrank convention
    rows = [(i, 7, i % 2) for i in range(8)]
    assert _run_auc(spark, rows)[4] == 0.5


# --- nDCG --------------------------------------------------------------------

def _py_ndcg(rows, k=10):
    from collections import defaultdict

    per_q = defaultdict(list)
    for q, rnk, rel in rows:
        if rnk <= k:
            per_q[q].append((rnk, rel))
    out = []
    for q in sorted(per_q):
        pts = sorted(per_q[q])
        dcg = sum(rel * round(PPM / math.log2(i + 1))
                  for i, rel in pts)
        ideal = sorted(pts, key=lambda p: (-p[1], p[0]))
        idcg = sum(rel * round(PPM / math.log2(j + 1))
                   for j, (_, rel) in enumerate(ideal, 1))
        nd = dcg * PPM // idcg if idcg > 0 else None
        out.append((q, dcg, idcg, nd))
    return out


NDCG_ROWS = (
    [("q1", i, 3 - (i - 1)) for i in range(1, 4)]     # perfectly ordered
    + [("q2", 1, 0), ("q2", 2, 3), ("q2", 3, 1)]      # badly ordered
    + [("q3", 1, 0), ("q3", 2, 0)]                    # all irrelevant
    + [("q4", i, (i * 7) % 4) for i in range(1, 12)]  # ranks beyond k drop
)


def _run_ndcg(spark, rows, k=10):
    from eget_spark.operators.evalmetrics import ndcg_at_k

    df = spark.createDataFrame(rows, "query string, rnk long, rel long")
    out = ndcg_at_k(df, "query", "rnk", "rel", k=k).collect()
    return [(r["query"], r["dcg_micro"], r["idcg_micro"], r["ndcg_ppm"])
            for r in out]


def test_ndcg_matches_python_replay(spark):
    assert _run_ndcg(spark, NDCG_ROWS) == _py_ndcg(NDCG_ROWS)


def test_perfect_order_is_unity(spark):
    got = {r[0]: r for r in _run_ndcg(spark, NDCG_ROWS)}
    assert got["q1"][3] == PPM
    assert got["q2"][3] < PPM
    assert got["q3"][3] is None


# --- Kendall tau-b -----------------------------------------------------------

def _py_tau(rows, max_items=200):
    pts = sorted(rows)[:max_items]
    c = d = tx = ty = n0 = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            n0 += 1
            dx = pts[j][1] - pts[i][1]
            dy = pts[j][2] - pts[i][2]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            s = (dx > 0) - (dx < 0)
            t = (dy > 0) - (dy < 0)
            if s * t == 1:
                c += 1
            elif s * t == -1:
                d += 1
    denom = (n0 - tx) * (n0 - ty)
    tau = round((c - d) / math.sqrt(denom), 6) if denom > 0 else None
    return (len(pts), c, d, tx, ty, tau)


TAU_ROWS = [
    (1, 10, 100), (2, 20, 90), (3, 30, 120), (4, 40, 150),
    (5, 50, 150), (6, 50, 200), (7, 70, 10),
]


def _run_tau(spark, rows, max_items=200):
    from eget_spark.operators.evalmetrics import kendall_tau_b

    df = spark.createDataFrame(rows, "id long, x long, y long")
    r = kendall_tau_b(df, "id", "x", "y", max_items=max_items).collect()[0]
    return (r["n_items"], r["concordant"], r["discordant"], r["ties_x"],
            r["ties_y"], r["tau_b"])


def test_tau_matches_python_replay(spark):
    assert _run_tau(spark, TAU_ROWS) == _py_tau(TAU_ROWS)


def test_identical_rankings_tau_one(spark):
    rows = [(i, i, i * 10) for i in range(1, 8)]
    assert _run_tau(spark, rows)[5] == 1.0


def test_reversed_rankings_tau_minus_one(spark):
    rows = [(i, i, -i) for i in range(1, 8)]
    assert _run_tau(spark, rows)[5] == -1.0


def test_tau_item_cap(spark):
    assert _run_tau(spark, TAU_ROWS, max_items=4) == _py_tau(
        TAU_ROWS, max_items=4
    )


# --- Spearman rho ------------------------------------------------------------

def _py_rho(rows):
    n = len(rows)

    def mid2(vals):
        order = sorted(range(n), key=lambda i: (vals[i], rows[i][0]))
        r = [0] * n
        i = 0
        # midrank depends only on the VALUE group, not the id tiebreak
        by_val = {}
        for pos, idx in enumerate(order, 1):
            by_val.setdefault(vals[idx], []).append(pos)
        for idx in range(n):
            ps = by_val[vals[idx]]
            r[idx] = min(ps) + max(ps)  # 2 * average rank
        return r

    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    mx, my = mid2(xs), mid2(ys)
    sx, sy = sum(mx), sum(my)
    sxx = sum(v * v for v in mx)
    syy = sum(v * v for v in my)
    sxy = sum(a * b for a, b in zip(mx, my))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    rho = (round(cov / math.sqrt(float(vx) * float(vy)), 6)
           if vx > 0 and vy > 0 else None)
    return (n, rho)


def _run_rho(spark, rows):
    from eget_spark.operators.evalmetrics import spearman_rho

    df = spark.createDataFrame(rows, "id long, x long, y long")
    r = spearman_rho(df, "id", "x", "y").collect()[0]
    return (r["n"], r["rho"])


def test_rho_matches_python_replay(spark):
    assert _run_rho(spark, TAU_ROWS) == _py_rho(TAU_ROWS)


def test_rho_monotone_is_one(spark):
    rows = [(i, i, i * i) for i in range(1, 9)]
    assert _run_rho(spark, rows)[1] == 1.0


def test_rho_reversed_is_minus_one(spark):
    rows = [(i, i, -i) for i in range(1, 9)]
    assert _run_rho(spark, rows)[1] == -1.0


def test_rho_constant_ranking_null(spark):
    rows = [(i, 5, i) for i in range(1, 6)]
    assert _run_rho(spark, rows)[1] is None


def test_rho_tied_blocks_exact(spark):
    rows = [(1, 1, 1), (2, 1, 2), (3, 2, 2), (4, 2, 1), (5, 3, 3)]
    assert _run_rho(spark, rows) == _py_rho(rows)


# --- McNemar -----------------------------------------------------------------

def _py_mcnemar(rows):
    n = len(rows)
    br = sum(1 for a, b in rows if a == 1 and b == 1)
    bw = sum(1 for a, b in rows if a == 0 and b == 0)
    oa = sum(1 for a, b in rows if a == 1 and b == 0)
    ob = sum(1 for a, b in rows if a == 0 and b == 1)
    chi2 = (round((abs(oa - ob) - 1) ** 2 / (oa + ob), 6)
            if oa + ob > 0 else None)
    return (n, br, bw, oa, ob, chi2)


MCN_ROWS = ([(1, 1)] * 40 + [(0, 0)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 15)


def _run_mcnemar(spark, rows):
    from eget_spark.operators.evalmetrics import mcnemar_test

    df = spark.createDataFrame(rows, "a_correct long, b_correct long")
    r = mcnemar_test(df, "a_correct", "b_correct").collect()[0]
    return (r["n_items"], r["both_right"], r["both_wrong"], r["only_a"],
            r["only_b"], r["chi2"])


def test_mcnemar_matches_python_replay(spark):
    assert _run_mcnemar(spark, MCN_ROWS) == _py_mcnemar(MCN_ROWS)


def test_mcnemar_no_discordance_null(spark):
    rows = [(1, 1)] * 5 + [(0, 0)] * 5
    assert _run_mcnemar(spark, rows)[5] is None


def test_mcnemar_concordance_irrelevant(spark):
    # adding both-right items changes chi2 not at all
    a = _run_mcnemar(spark, MCN_ROWS)
    b = _run_mcnemar(spark, MCN_ROWS + [(1, 1)] * 100)
    assert a[5] == b[5]
