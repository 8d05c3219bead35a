"""Time-bucket rollup + merge identity (operators/rollup.py)."""

import datetime

from eget_spark.operators.rollup import merge_rollups, rollup_events


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), k, v)
         for i, (s, k, v) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, key string, value double",
    )


def test_bucketing_and_fixed_point(spark):
    ev = _events(spark, [(0, "a", 1.25), (3599, "a", 2.5), (3600, "a", 4.0)])
    out = {r["bucket_us"]: r.asDict() for r in rollup_events(
        ev, "key", "ts", "value").collect()}
    h0 = 1704067200 * 1_000_000  # 2024-01-01T00:00 epoch micros
    assert out[h0]["n_events"] == 2
    assert out[h0]["sum_value_fp"] == 3_750_000
    assert out[h0 + 3_600_000_000]["sum_value_fp"] == 4_000_000


def test_merge_identity_equals_batch(spark):
    rows = [((i * 977) % 7200, f"k{i % 3}", (i % 11) / 4.0) for i in range(60)]
    ev = _events(spark, rows)
    batch = rollup_events(ev, "key", "ts", "value")
    parts = [
        rollup_events(ev.where(f"event_id % 3 = {j}"), "key", "ts", "value")
        for j in range(3)
    ]
    merged = merge_rollups(*parts)
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, merged.collect()))


def test_min_max_fold(spark):
    ev = _events(spark, [(0, "a", 5.0), (1, "a", -2.5), (2, "a", 9.0)])
    m = merge_rollups(
        rollup_events(ev.where("event_id < 2"), "key", "ts", "value"),
        rollup_events(ev.where("event_id >= 2"), "key", "ts", "value"),
    ).collect()[0]
    assert m["min_value_fp"] == -2_500_000
    assert m["max_value_fp"] == 9_000_000
