"""Crawl snapshot diff (operators/snapshot_diff.py)."""

from __future__ import annotations

from eget_spark.operators.snapshot_diff import diff_counts, snapshot_diff


def test_planted_partition(spark):
    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c"), ("u4", "d")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u2", "b"), ("u3", "C!"), ("u4", "d"), ("u5", "e")],
        "url string, text string",
    )
    d = {r["key"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert d == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "unchanged",
        "u5": "added",
    }
    counts = {r["status"]: r["n"] for r in diff_counts(snapshot_diff(old, new)).collect()}
    assert counts == {"removed": 1, "unchanged": 2, "changed": 1, "added": 1}


def test_identical_snapshots_are_all_unchanged(spark):
    df = spark.createDataFrame([("u1", "x"), ("u2", "y")], "url string, text string")
    out = snapshot_diff(df, df).collect()
    assert {r["status"] for r in out} == {"unchanged"}
    assert all(r["old_fp"] == r["new_fp"] for r in out)


def test_shuffled_payload_is_fingerprints_only(spark):
    # the join input projects (key, md5) before the exchange — the text
    # column must not cross the shuffle
    df = spark.createDataFrame([("u1", "x" * 10000)], "url string, text string")
    plan = (
        snapshot_diff(df, df)._jdf.queryExecution().optimizedPlan().toString()
    )
    # both join children are key+fingerprint projections
    assert plan.count("md5(cast(text") == 2
    assert "old_fp" in plan and "new_fp" in plan
