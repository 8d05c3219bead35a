"""Distributed global sequencing == single-partition orderBy rank."""

from __future__ import annotations

import random

from eget_spark.operators.sequence import with_global_seq


def test_global_seq_matches_sorted_order(spark):
    rng = random.Random(7)
    rows = [(rng.randrange(10**6), f"u{rng.randrange(10**9):09d}") for _ in range(5000)]
    rows = list({(a, b) for a, b in rows})  # unique keys (ties not allowed)
    df = spark.createDataFrame(rows, "parent_seq long, url string").repartition(16)
    sr = with_global_seq(df, ["parent_seq", "url"], start=42)
    got = [
        (r["parent_seq"], r["url"], r["seq"])
        for r in sr.df.orderBy("seq").collect()
    ]
    want = sorted(rows)
    assert [g[:2] for g in got] == want
    assert [g[2] for g in got] == list(range(42, 42 + len(rows)))
    assert sr.total == len(rows)
    sr.unpersist()


def test_global_seq_empty(spark):
    df = spark.createDataFrame([], "parent_seq long, url string")
    sr = with_global_seq(df, ["parent_seq", "url"], start=0)
    assert sr.df.count() == 0
    assert sr.total == 0
    sr.unpersist()


def test_global_seq_bucketed_matches_range_path(spark):
    """The bucketed strategy (monotone bucket_expr, no sampling pass) must
    produce the exact same global ranks as the range-exchange path."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = list(
        {(rng.randrange(5000), f"u{rng.randrange(10**9):09d}") for _ in range(4000)}
    )
    df = spark.createDataFrame(rows, "parent_seq long, url string").repartition(8)
    a = with_global_seq(df, ["parent_seq", "url"], start=7)
    b = with_global_seq(
        df,
        ["parent_seq", "url"],
        start=7,
        bucket_expr=F.floor(F.col("parent_seq") / 64),
    )
    got_a = [(r["parent_seq"], r["url"], r["seq"]) for r in a.df.orderBy("seq").collect()]
    got_b = [(r["parent_seq"], r["url"], r["seq"]) for r in b.df.orderBy("seq").collect()]
    assert got_a == got_b
    assert b.total == len(rows)
    a.unpersist()
    b.unpersist()
