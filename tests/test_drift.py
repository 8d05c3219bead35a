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
