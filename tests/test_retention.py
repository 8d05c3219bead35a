"""Snapshot retention (operators/snapshot_diff.retain_last_k)."""

from eget_spark.operators.snapshot_diff import retain_last_k


def test_keeps_newest_k(spark):
    rows = [("u", t) for t in [10, 30, 20, 50, 40]] + [("v", 7)]
    df = spark.createDataFrame(rows, "url string, fetch_time long")
    out = retain_last_k(df, k=2).collect()
    kept = sorted(r["fetch_time"] for r in out if r["url"] == "u" and r["keep"])
    dropped = sorted(r["fetch_time"] for r in out if r["url"] == "u" and not r["keep"])
    assert kept == [40, 50]
    assert dropped == [10, 20, 30]
    assert [r["keep"] for r in out if r["url"] == "v"] == [True]


def test_all_kept_when_fewer_than_k(spark):
    df = spark.createDataFrame([("u", 1), ("u", 2)], "url string, fetch_time long")
    assert all(r["keep"] for r in retain_last_k(df, k=5).collect())


def test_deterministic_under_partitioning(spark):
    rows = [(f"u{i % 7}", (i * 13) % 101) for i in range(80)]
    df = spark.createDataFrame(rows, "url string, fetch_time long")
    a = sorted(map(tuple, retain_last_k(df.repartition(1), 3).collect()))
    b = sorted(map(tuple, retain_last_k(df.repartition(16), 3).collect()))
    assert a == b
