"""Rate-anomaly z-scores vs a Python oracle (densified, integer-exact)."""

from __future__ import annotations

import math


def _oracle(rows, threshold):
    from collections import Counter

    counts = Counter(rows)
    keys = {k for k, _ in rows}
    lo = min(b for _, b in rows)
    hi = max(b for _, b in rows)
    out = {}
    for k in keys:
        series = [(b, counts.get((k, b), 0)) for b in range(lo, hi + 1)]
        nb = len(series)
        s1 = sum(c for _, c in series)
        s2 = sum(c * c for _, c in series)
        var_num = nb * s2 - s1 * s1
        if var_num <= 0:
            continue
        mean = s1 / nb
        sd = math.sqrt(var_num / (nb * nb))
        for b, c in series:
            z = (c - mean) / sd
            if abs(z) >= threshold:
                out[(k, b)] = (c, round(z, 9))
    return out


def test_rate_anomalies_matches_python_oracle(spark):
    from eget_spark.operators.anomaly import rate_anomalies

    rows = []
    for k in ("h1", "h2"):
        for b in range(10):
            rows += [(k, b)] * 3  # steady baseline of 3/bucket
    rows += [("h1", 4)] * 30  # spike
    # h2 bucket 9 is quiet only via densification? no — make bucket 11
    # exist globally so h2 has trailing zeros
    rows += [("h3", 11)] * 3
    df = spark.createDataFrame(rows, "k string, b long").repartition(4)
    got = {
        (r["key"], r["bucket"]): (r["cnt"], round(r["z"], 9))
        for r in rate_anomalies(df, "k", "b", threshold=2.0).collect()
    }
    assert got == _oracle(rows, 2.0)
    assert ("h1", 4) in got  # the planted spike is flagged
    assert got[("h1", 4)][0] == 33


def test_constant_series_never_anomalous(spark):
    from eget_spark.operators.anomaly import rate_anomalies

    rows = [("k", b) for b in range(5)] * 2  # constant 2 per bucket
    df = spark.createDataFrame(rows, "k string, b long")
    assert rate_anomalies(df, "k", "b", threshold=0.0).count() == 0


def test_densification_flags_missing_buckets(spark):
    from eget_spark.operators.anomaly import rate_anomalies

    # key active only in bucket 0 of a global 0..9 range: its own series
    # is (9,0,...,0); bucket 0 is the anomaly
    rows = [("a", 0)] * 9 + [("other", b) for b in range(10)]
    df = spark.createDataFrame(rows, "k string, b long")
    got = {(r["key"], r["bucket"]) for r in rate_anomalies(df, "k", "b", 2.0).collect()}
    assert ("a", 0) in got


# --- EWMA rate smoothing -------------------------------------------------------


def _py_ewma(xs, num=3, den=10, sc=10**6):
    xs = [x * sc for x in xs]
    e = xs[0]
    for x in xs[1:]:
        e = (num * x + (den - num) * e) // den
    return e


def test_ewma_matches_python_fold(spark):
    import datetime as dt

    from eget_spark.operators.anomaly import ewma_rates

    base = dt.datetime(2024, 1, 1)
    rows = []
    # A: hours 0,0,0,2 (hour 1 quiet); B: hour 1 only
    for i in range(3):
        rows.append(("A", base + dt.timedelta(minutes=i)))
    rows.append(("A", base + dt.timedelta(hours=2, minutes=5)))
    rows.append(("B", base + dt.timedelta(hours=1)))
    rows.append(("B", base + dt.timedelta(hours=1, minutes=7)))
    df = spark.createDataFrame(rows, "host string, ts timestamp")
    got = {
        r["key"]: (r["n_events"], r["ewma_fp"])
        for r in ewma_rates(df, "host", "ts").collect()
    }
    # densified over the GLOBAL range hours 0..2
    assert got == {
        "A": (4, _py_ewma([3, 0, 1])),
        "B": (2, _py_ewma([0, 2, 0])),
    }


def test_ewma_quiet_gap_decays(spark):
    import datetime as dt

    from eget_spark.operators.anomaly import ewma_rates

    base = dt.datetime(2024, 1, 1)
    rows = [("A", base)] * 10 + [("A", base + dt.timedelta(hours=5))]
    df = spark.createDataFrame(rows, "host string, ts timestamp")
    got = ewma_rates(df, "host", "ts").collect()[0]
    assert got["ewma_fp"] == _py_ewma([10, 0, 0, 0, 0, 1])
    # four quiet hours must have decayed the estimate well below the burst
    assert got["ewma_fp"] < 10 * 10**6 // 2


def test_ewma_single_bucket_is_identity(spark):
    import datetime as dt

    from eget_spark.operators.anomaly import ewma_rates

    df = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1))] * 7, "host string, ts timestamp"
    )
    got = ewma_rates(df, "host", "ts").collect()[0]
    assert (got["n_events"], got["ewma_fp"]) == (7, 7 * 10**6)


# --- burstiness census -------------------------------------------------------

def _py_burst(rows):
    import math
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for k, b in rows:
        per[k][b] += 1
    out = []
    for k in sorted(per):
        cs = list(per[k].values())
        n = len(cs)
        s = sum(cs)
        s2 = sum(c * c for c in cs)
        vn = n * s2 - s * s
        var = vn / (float(n) * float(n))
        mean = float(s) / float(n)
        sd = math.sqrt(var)
        fano = round(vn / (float(n) * float(s)), 6) if s else None
        cv2 = round(vn / (float(s) * float(s)), 6) if s else None
        b_ = round((sd - mean) / (sd + mean), 6) if s else None
        out.append((k, n, s, fano, cv2, b_))
    return out


BURST_ROWS = (
    # steady host: one event per bucket -> var 0, fano 0, B = -1
    [("steady", b) for b in range(10)]
    # poisson-ish spread
    + [("spread", b) for b in [0, 0, 1, 2, 2, 2, 3, 5, 5, 7, 8, 8]]
    # bursty: everything in one bucket of many observed
    + [("bursty", 0)] * 30 + [("bursty", b) for b in range(1, 6)]
)


def _run_burst(spark, rows):
    from eget_spark.operators.anomaly import burstiness_census

    df = spark.createDataFrame(rows, "host string, bucket long")
    out = burstiness_census(df, "host", "bucket").collect()
    return [
        (r["key"], r["n_buckets"], r["total"], r["fano"], r["cv2"],
         r["burstiness"])
        for r in out
    ]


def test_burst_matches_python_replay(spark):
    assert _run_burst(spark, BURST_ROWS) == _py_burst(BURST_ROWS)


def test_steady_host_fano_zero_b_minus_one(spark):
    got = {r[0]: r for r in _run_burst(spark, BURST_ROWS)}
    assert got["steady"][3] == 0.0 and got["steady"][5] == -1.0


def test_bursty_exceeds_spread(spark):
    got = {r[0]: r for r in _run_burst(spark, BURST_ROWS)}
    assert got["bursty"][3] > got["spread"][3]
    assert got["bursty"][5] > got["spread"][5]
