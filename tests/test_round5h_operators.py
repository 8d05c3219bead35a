"""Property tests for the q169-q171 batch (ANN recall eval, scheme-dup
collapse, compression signal) against pure-Python references."""

from __future__ import annotations

import random
import zlib

from pyspark.sql import functions as F


def test_compression_signals_reference(spark):
    from eget_spark.operators.quality_rules import compression_signals

    rng = random.Random(62)
    rows = [
        (0, ""),
        (1, "spam " * 400),
        (2, "x"),
        (3, None),
    ] + [
        (i, " ".join(f"w{rng.randint(0, 500)}" for _ in range(50)))
        for i in range(4, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["raw_len"], r["z_len"], r["ratio_permille"])
        for r in compression_signals(df, "doc_id", "text").collect()
    }
    for i, t in rows:
        t = t or ""
        raw = len(t.encode("utf-8"))
        zl = len(zlib.compress(t.encode("utf-8"), 6)) if t else 0
        ratio = zl * 1000 // raw if raw else None
        assert got[i] == (raw, zl, ratio), i
    # the signal separates repetitive from random text
    assert got[1][2] < got[4][2]


def test_compression_signals_partition_invariance(spark):
    from eget_spark.operators.quality_rules import compression_signals

    rows = [(i, f"doc {i} " * (i % 7 + 1)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, compression_signals(df, "doc_id", "text").collect()))
    b = sorted(
        map(
            tuple,
            compression_signals(
                df.repartition(11), "doc_id", "text"
            ).collect(),
        )
    )
    assert a == b


def test_ann_recall_bounds_and_exact_router(spark):
    import __spark_entry__ as entry

    rows = entry.q169_ann_recall(spark, "/root/testdata/sf0.001").collect()
    assert rows, "at least one query row"
    for r in rows:
        assert r["n_truth"] >= 1
        assert 0 <= r["n_hit"] <= r["n_truth"]
        assert r["recall_permille"] == r["n_hit"] * 1000 // r["n_truth"]


def test_scheme_dupes_pinned(spark):
    from eget_spark.functions.urls import surt_key

    df = spark.createDataFrame(
        [
            (0, "http://a.example.com/p/1"),
            (1, "https://a.example.com/p/1"),
            (2, "https://b.example.com/p/2"),
        ],
        "id long, url string",
    )
    out = (
        df.select(
            surt_key(F.col("url")).alias("surt"),
            F.regexp_extract("url", r"^([a-z]+)://", 1).alias("s"),
            "url",
        )
        .groupBy("surt")
        .agg(
            F.countDistinct("s").alias("n_schemes"),
            F.min("url").alias("canonical"),
        )
        .collect()
    )
    got = {r["surt"]: (r["n_schemes"], r["canonical"]) for r in out}
    assert got["com,example,a)/p/1"] == (2, "http://a.example.com/p/1")
    assert got["com,example,b)/p/2"] == (1, "https://b.example.com/p/2")
