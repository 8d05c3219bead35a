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


def test_null_content_presence_and_retention_tiebreak(spark):
    from eget_spark.operators.snapshot_diff import retain_last_k, snapshot_diff

    old = spark.createDataFrame(
        [("u1", None), ("u2", None), ("u3", "x")], "url string, text string"
    )
    new = spark.createDataFrame(
        [("u1", "hi"), ("u2", None), ("u4", None)], "url string, text string"
    )
    got = {r["key"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "u1": "changed",    # NULL -> 'hi' is a change, not an add
        "u2": "unchanged",  # NULL on both sides
        "u3": "removed",
        "u4": "added",      # genuinely absent from old
    }
    # retention tiebreak: same (url, version) but different content —
    # the winner is partitioning-independent (full-row hash order)
    snaps = spark.createDataFrame(
        [("u", 5, "a"), ("u", 5, "b"), ("u", 3, "c")],
        "url string, fetch_time long, content string",
    )
    keep1 = sorted(
        (r["content"], r["keep"]) for r in retain_last_k(snaps, 1).collect()
    )
    keep2 = sorted(
        (r["content"], r["keep"])
        for r in retain_last_k(snaps.repartition(7), 1).collect()
    )
    assert keep1 == keep2 and sum(1 for _, k in keep1 if k) == 1
