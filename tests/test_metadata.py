"""X4/X8/X9 metadata extraction from `metadata` spans."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from eget_spark.functions.metadata import (
    language_of,
    metadata_map,
    open_graph,
    title_of,
    twitter_card,
)


def test_metadata_extraction(spark, docs_small, corpus_small):
    got = docs_small.select(
        "doc_id",
        metadata_map(F.col("spans")).alias("m"),
        open_graph(F.col("spans")).alias("og"),
        twitter_card(F.col("spans")).alias("tw"),
        language_of(F.col("spans")).alias("lang"),
        title_of(F.col("spans")).alias("title"),
    ).collect()
    assert got
    for r in got:
        meta_spans = [s for s in corpus_small[r["doc_id"]] if s["kind"] == "metadata"]
        want = json.loads(meta_spans[0]["text"])
        assert dict(r["m"]) == want
        assert dict(r["og"]) == {k: v for k, v in want.items() if k.startswith("og:")}
        assert dict(r["tw"]) == {k: v for k, v in want.items() if k.startswith("twitter:")}
        assert r["lang"] == want["lang"]
        assert r["title"] == want["title"]


def test_metadata_missing_span(spark):
    df = spark.createDataFrame(
        [([("paragraph", "x", "", 0)],)],
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    row = df.select(
        metadata_map(F.col("spans")).alias("m"),
        language_of(F.col("spans")).alias("lang"),
    ).collect()[0]
    assert row["m"] is None
    assert row["lang"] == ""
