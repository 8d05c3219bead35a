"""CUSUM drift detection vs a pure-Python sequential replay.

The operator computes Page's recurrence via the running-sum/running-min
closed form; the replay runs the literal S_n = max(0, S_{n-1} + x - k)
recursion, so the tests pin the closed form's equivalence."""

from __future__ import annotations


def _py_cusum(rows, k, h):
    by_key: dict[str, list[tuple[int, int]]] = {}
    for key, ts, v in rows:
        by_key.setdefault(key, []).append((ts, v))
    out = {}
    for key, pts in by_key.items():
        pts.sort()
        s = 0
        max_s = 0
        alarm = None
        for ts, v in pts:
            s = max(0, s + v - k)
            max_s = max(max_s, s)
            if alarm is None and s >= h:
                alarm = ts
        out[key] = (len(pts), max_s, alarm, max_s >= h)
    return out


ROWS = (
    # steady host: values hug the reference, never alarms
    [("steady", t, 100 + (3 if t % 2 else -3)) for t in range(12)]
    # stepped host: in-control 10 steps, then +30 shift
    + [("stepped", t, 100) for t in range(10)]
    + [("stepped", t, 130) for t in range(10, 20)]
    # spike host: one huge outlier, then recovers (CUSUM decays back)
    + [("spike", t, 100) for t in range(5)]
    + [("spike", 5, 400)]
    + [("spike", t, 80) for t in range(6, 12)]
)
K, H = 110, 60


def _run(spark, rows, k=K, h=H):
    from eget_spark.operators.drift import cusum_drift

    df = spark.createDataFrame(rows, "host string, ts long, value long")
    out = cusum_drift(df, "host", "ts", "value", k=k, h=h).collect()
    return {
        r["key"]: (r["n"], r["max_cusum"], r["alarm_ts"], r["drifted"])
        for r in out
    }


def test_matches_sequential_replay(spark):
    assert _run(spark, ROWS) == _py_cusum(ROWS, K, H)


def test_step_change_alarms_spike_decays(spark):
    got = _run(spark, ROWS)
    assert got["stepped"][3] is True
    assert got["steady"][3] is False
    # the single 400 spike exceeds h momentarily: max 290 >= 60 fires,
    # matching the sequential detector exactly
    assert got["spike"] == _py_cusum(ROWS, K, H)["spike"]


def test_alarm_ts_is_first_crossing(spark):
    got = _run(spark, ROWS)
    # +20/step after t=10: crosses 60 at the 3rd drifted point (t=12)
    assert got["stepped"][2] == 12


def test_reset_floor_at_zero(spark):
    # long in-control run then a small bump: without the max(0, .)
    # floor the bump would be swallowed by the accumulated deficit
    rows = [("x", t, 50) for t in range(10)] + [("x", 10, 200)]
    got = _run(spark, rows, k=100, h=80)
    assert got == _py_cusum(rows, 100, 80)
    assert got["x"][1] == 100  # 200-100, NOT 100 - 10*50 deficit


def test_all_below_reference_never_alarms(spark):
    rows = [("y", t, 10) for t in range(8)]
    got = _run(spark, rows, k=100, h=1)
    assert got["y"] == (8, 0, None, False)


# --- KS two-sample -----------------------------------------------------------

def _py_ks(rows, ga, gb):
    sa = sorted(v for g, v in rows if g == ga)
    sb = sorted(v for g, v in rows if g == gb)
    na, nb = len(sa), len(sb)
    best = (0, None)
    for v in sorted(set(sa) | set(sb)):
        ca = sum(1 for x in sa if x <= v)
        cb = sum(1 for x in sb if x <= v)
        dev = abs(nb * ca - na * cb)
        if dev > best[0]:
            best = (dev, v)
    d = round(best[0] / (float(na) * float(nb)), 6)
    return (na, nb, best[0], d, best[1])


KS_ROWS = (
    [("fast", v) for v in [10, 12, 15, 15, 18, 20, 22, 25]]
    + [("slow", v) for v in [11, 14, 30, 35, 40, 45, 50]]
)


def _run_ks(spark, rows, ga, gb):
    from eget_spark.operators.drift import ks_two_sample

    df = spark.createDataFrame(rows, "host string, value long")
    r = ks_two_sample(df, "host", "value", ga, gb).collect()[0]
    return (r["n_a"], r["n_b"], r["d_num"], r["d"], r["at_value"])


def test_ks_matches_python_replay(spark):
    assert _run_ks(spark, KS_ROWS, "fast", "slow") == _py_ks(
        KS_ROWS, "fast", "slow"
    )


def test_ks_identical_samples_zero(spark):
    rows = [("a", v) for v in range(10)] + [("b", v) for v in range(10)]
    got = _run_ks(spark, rows, "a", "b")
    assert got[2] == 0 and got[3] == 0.0


def test_ks_disjoint_supports_is_one(spark):
    rows = [("a", v) for v in range(5)] + [("b", 100 + v) for v in range(7)]
    assert _run_ks(spark, rows, "a", "b")[3] == 1.0


def test_ks_symmetric_in_groups(spark):
    ab = _run_ks(spark, KS_ROWS, "fast", "slow")
    ba = _run_ks(spark, KS_ROWS, "slow", "fast")
    assert ab[2] == ba[2] and ab[3] == ba[3]


# --- PSI ---------------------------------------------------------------------

def _py_psi(rows, ga, gb):
    import math
    from collections import Counter

    ca = Counter(b for g, b in rows if g == ga)
    cb = Counter(b for g, b in rows if g == gb)
    buckets = sorted(set(ca) | set(cb))
    na, nb, nbk = sum(ca.values()), sum(cb.values()), len(buckets)
    out = []
    for b in buckets:
        pa = (ca.get(b, 0) + 1) / (na + nbk)
        pb = (cb.get(b, 0) + 1) / (nb + nbk)
        out.append([b, ca.get(b, 0), cb.get(b, 0),
                    round((pa - pb) * math.log(pa / pb) * 1e6)])
    tot = sum(t[3] for t in out)
    return [(b, x, y, t, tot) for b, x, y, t in out]


PSI_ROWS = (
    [("before", b) for b in [0] * 30 + [1] * 40 + [2] * 20 + [3] * 10]
    + [("after", b) for b in [0] * 10 + [1] * 20 + [2] * 40 + [3] * 25
       + [4] * 5]
)


def _run_psi(spark, rows, ga, gb):
    from eget_spark.operators.drift import psi_buckets

    df = spark.createDataFrame(rows, "cohort string, bucket long")
    out = psi_buckets(df, "cohort", "bucket", ga, gb).collect()
    return [(r["bucket"], r["ca"], r["cb"], r["term_micro"],
             r["psi_total_micro"]) for r in out]


def test_psi_matches_python_replay(spark):
    assert _run_psi(spark, PSI_ROWS, "before", "after") == _py_psi(
        PSI_ROWS, "before", "after"
    )


def test_psi_identical_cohorts_zero(spark):
    rows = [("x", b) for b in [0, 1, 1, 2]] + [("y", b) for b in
                                               [0, 1, 1, 2]]
    got = _run_psi(spark, rows, "x", "y")
    assert all(r[3] == 0 for r in got) and got[0][4] == 0


def test_psi_shift_is_large(spark):
    got = _run_psi(spark, PSI_ROWS, "before", "after")
    assert got[0][4] > 250_000  # > 0.25: "shifted" by the usual read


# --- Wilson intervals --------------------------------------------------------

def _py_wilson(rows, z=1.959964):
    import math
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for k, s in rows:
        agg[k][0] += 1
        agg[k][1] += s
    out = []
    for k in sorted(agg):
        n, s = agg[k]
        p = s / n
        z2 = z * z
        denom = 1.0 + z2 / n
        center = (p + z2 / (2.0 * n)) / denom
        half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom
        out.append((k, n, s, round(p, 6), round(center - half, 6),
                    round(center + half, 6)))
    return out


WILSON_ROWS = (
    [("lucky", 1)] * 7                      # 7/7: hi ~1 but lo << 1
    + [("big", 1)] * 900 + [("big", 0)] * 100
    + [("dead", 0)] * 12
)


def _run_wilson(spark, rows):
    from eget_spark.operators.drift import wilson_intervals

    df = spark.createDataFrame(rows, "host string, success long")
    out = wilson_intervals(df, "host", "success").collect()
    return [(r["key"], r["n"], r["successes"], r["p"], r["lo"], r["hi"])
            for r in out]


def test_wilson_matches_python_replay(spark):
    assert _run_wilson(spark, WILSON_ROWS) == _py_wilson(WILSON_ROWS)


def test_wilson_small_perfect_sample_stays_uncertain(spark):
    got = {r[0]: r for r in _run_wilson(spark, WILSON_ROWS)}
    assert got["lucky"][3] == 1.0 and got["lucky"][4] < 0.65


def test_wilson_big_sample_tightens(spark):
    got = {r[0]: r for r in _run_wilson(spark, WILSON_ROWS)}
    assert got["big"][5] - got["big"][4] < 0.04
    assert got["dead"][4] == 0.0  # p=0: lower bound clamps at 0


# --- Wasserstein-1 -----------------------------------------------------------

def _py_w1(rows, ga, gb):
    sa = sorted(v for g, v in rows if g == ga)
    sb = sorted(v for g, v in rows if g == gb)
    na, nb = len(sa), len(sb)
    vs = sorted(set(sa) | set(sb))
    w1 = 0
    for i in range(1, len(vs)):
        prev = vs[i - 1]
        ca = sum(1 for x in sa if x <= prev)
        cb = sum(1 for x in sb if x <= prev)
        w1 += abs(nb * ca - na * cb) * (vs[i] - prev)
    return (na, nb, w1, round(w1 / (float(na) * float(nb)), 6))


def _run_w1(spark, rows, ga, gb):
    from eget_spark.operators.drift import wasserstein_1d

    df = spark.createDataFrame(rows, "host string, value long")
    r = wasserstein_1d(df, "host", "value", ga, gb).collect()[0]
    return (r["n_a"], r["n_b"], r["w1_num"], r["w1"])


def test_w1_matches_python_replay(spark):
    assert _run_w1(spark, KS_ROWS, "fast", "slow") == _py_w1(
        KS_ROWS, "fast", "slow"
    )


def test_w1_identical_zero(spark):
    rows = [("a", v) for v in [1, 5, 9]] + [("b", v) for v in [1, 5, 9]]
    assert _run_w1(spark, rows, "a", "b")[3] == 0.0


def test_w1_constant_shift_is_the_shift(spark):
    # F_b is F_a shifted by +17: W1 == 17 exactly
    rows = [("a", v) for v in [10, 20, 30, 40]] + [
        ("b", v + 17) for v in [10, 20, 30, 40]
    ]
    assert _run_w1(spark, rows, "a", "b")[3] == 17.0


def test_w1_vs_ks_tell_shapes_apart(spark):
    # long mild drift vs short sharp gap: same KS class, different W1
    mild = ([("a", v) for v in range(0, 100, 10)]
            + [("b", v + 3) for v in range(0, 100, 10)])
    sharp = ([("a", v) for v in [0, 1, 2, 3, 4]]
             + [("b", v) for v in [0, 1, 2, 3, 50]])
    w_mild = _run_w1(spark, mild, "a", "b")[3]
    w_sharp = _run_w1(spark, sharp, "a", "b")[3]
    assert w_mild == _py_w1(mild, "a", "b")[3]
    assert w_sharp == _py_w1(sharp, "a", "b")[3]


# --- best thresholds ---------------------------------------------------------

def _py_best(rows):
    from collections import Counter

    pos = Counter(s for s, y in rows if y == 1)
    neg = Counter(s for s, y in rows if y == 0)
    p_tot, n_tot = sum(pos.values()), sum(neg.values())
    cands = []
    tp = fp = 0
    for s in sorted(set(pos) | set(neg), reverse=True):
        tp += pos.get(s, 0)
        fp += neg.get(s, 0)
        prec = tp * 10**6 // (tp + fp)
        rec = tp * 10**6 // max(p_tot, 1)
        f1 = (2 * prec * rec // (prec + rec)) if prec + rec > 0 else 0
        j = tp * 10**6 // max(p_tot, 1) - fp * 10**6 // max(n_tot, 1)
        cands.append((s, tp, fp, p_tot - tp, n_tot - fp, prec, rec, f1, j))
    best_f1 = max(cands, key=lambda c: (c[7], c[0]))
    best_j = max(cands, key=lambda c: (c[8], c[0]))
    return [("f1",) + best_f1, ("youden_j",) + best_j]


THR_ROWS = (
    [(900 + i, 1) for i in range(5)]
    + [(700, 1), (700, 0), (650, 1)]
    + [(500, 0)] * 6 + [(500, 1)]
    + [(200 + i, 0) for i in range(8)]
)


def _run_best(spark, rows):
    from eget_spark.operators.drift import best_thresholds

    df = spark.createDataFrame(rows, "score long, label long")
    out = best_thresholds(df, "score", "label").collect()
    return [
        (r["criterion"], r["threshold"], r["tp"], r["fp"], r["fn"],
         r["tn"], r["precision_ppm"], r["recall_ppm"], r["f1_ppm"],
         r["j_micro"])
        for r in out
    ]


def test_best_matches_python_replay(spark):
    assert _run_best(spark, THR_ROWS) == _py_best(THR_ROWS)


def test_perfectly_separable_threshold(spark):
    rows = [(90 + i, 1) for i in range(4)] + [(10 + i, 0) for i in range(4)]
    got = {r[0]: r for r in _run_best(spark, rows)}
    # both criteria pick the lowest positive score; F1 and J are perfect
    assert got["f1"][1] == 90 and got["f1"][8] == 10**6
    assert got["youden_j"][1] == 90 and got["youden_j"][9] == 10**6


def test_tie_breaks_to_stricter_gate(spark):
    # two thresholds with identical confusion stats: higher one wins
    rows = [(100, 1), (90, 1), (50, 0), (40, 0)]
    got = {r[0]: r for r in _run_best(spark, rows)}
    assert got["f1"][1] == 90  # 90 and anything in (50, 90] tie; 90 kept


# --- SPRT --------------------------------------------------------------------

L_POS, L_NEG, BOUND = 336472, -510826, 2_944_439


def _py_sprt(rows):
    from collections import defaultdict

    per = defaultdict(list)
    for k, t, s in rows:
        per[k].append((t, s))
    out = {}
    for k, pts in per.items():
        pts.sort()
        llr = 0
        up = dn = None
        for t, s in pts:
            llr += L_POS if s == 1 else L_NEG
            if up is None and llr >= BOUND:
                up = t
            if dn is None and llr <= -BOUND:
                dn = t
        if up is not None and (dn is None or up < dn):
            dec = "accept_h1"
        elif dn is not None:
            dec = "accept_h0"
        else:
            dec = "continue"
        out[k] = (len(pts), llr, up, dn, dec)
    return out


SPRT_ROWS = (
    # strong host: mostly successes -> crosses +bound quickly
    [("good", t, 1) for t in range(12)]
    # weak host: mostly failures -> crosses -bound
    + [("bad", t, 0) for t in range(10)]
    # borderline host: alternates, never decides
    + [("meh", t, t % 2) for t in range(10)]
)


def _run_sprt(spark, rows):
    from eget_spark.operators.drift import sprt_decisions

    df = spark.createDataFrame(rows, "host string, ts long, success long")
    out = sprt_decisions(df, "host", "ts", "success").collect()
    return {
        r["key"]: (r["n"], r["llr_final_micro"], r["first_up_ts"],
                   r["first_dn_ts"], r["decision"])
        for r in out
    }


def test_sprt_matches_python_replay(spark):
    assert _run_sprt(spark, SPRT_ROWS) == _py_sprt(SPRT_ROWS)


def test_sprt_decisions(spark):
    got = _run_sprt(spark, SPRT_ROWS)
    assert got["good"][4] == "accept_h1"
    assert got["bad"][4] == "accept_h0"
    assert got["meh"][4] == "continue"


def test_sprt_stops_at_first_crossing(spark):
    # crosses +bound early, then a failure streak would cross -bound
    # later: SPRT already stopped -> h1
    rows = [("x", t, 1) for t in range(9)] + [
        ("x", 9 + t, 0) for t in range(30)
    ]
    got = _run_sprt(spark, rows)["x"]
    assert got == _py_sprt(rows)["x"]
    assert got[4] == "accept_h1" and got[2] < got[3]


def test_sprt_good_host_decides_in_nine(spark):
    # ceil(ln19 / ln(0.7/0.5)) = 9 consecutive successes
    got = _run_sprt(spark, SPRT_ROWS)
    assert got["good"][2] == 8  # ts are 0-based
