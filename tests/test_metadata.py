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


def test_json_ld_and_renamed_map(spark):
    """X8 span-side jsonLd harvest + X4 rename map mirror (scraper.py:
    373-390): og:* keys camelCased, lang -> language, passthrough others."""
    from eget_spark.functions.metadata import (
        json_ld_of,
        metadata_renamed_map,
        validated_structured_data,
    )

    meta = json.dumps(
        {
            "title": "t",
            "og:title": "ot",
            "og:site_name": "sn",
            "og:type": "article",
            "og:image:width": "640",
            "twitter:card": "summary",
            "lang": "en",
        }
    )
    ld1 = '{"@type":"Article"}'
    ld2 = '{"@type":"Person"}'
    df = spark.createDataFrame(
        [([("metadata", meta, "", 0), ("jsonld", ld1, "", 1), ("jsonld", ld2, "", 2), ("paragraph", "x", "", 3)],)],
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    row = df.select(
        json_ld_of(F.col("spans")).alias("ld"),
        metadata_renamed_map(F.col("spans")).alias("renamed"),
        validated_structured_data(F.col("spans")).alias("sd"),
    ).collect()[0]
    assert row["ld"] == [ld1, ld2]
    renamed = dict(row["renamed"])
    assert renamed["ogTitle"] == "ot"
    assert renamed["ogSiteName"] == "sn"
    assert renamed["og:type"] == "article"  # the non-camelCased exception
    assert renamed["ogImage:width"] == "640"  # generic og-capitalize
    assert renamed["language"] == "en"
    assert renamed["twitter:card"] == "summary"
    assert renamed["title"] == "t"
    assert list(row["sd"]["jsonLd"]) == [ld1, ld2]
    assert row["sd"]["metaData"]["title"] == "t"


def test_structured_data_fallback_shape(spark):
    """X10 fallback: no metadata span -> empty struct with language=''
    and jsonLd=[] (structured_data.py:132-147)."""
    from eget_spark.functions.metadata import validated_structured_data

    df = spark.createDataFrame(
        [([("paragraph", "x", "", 0)],)],
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    sd = df.select(validated_structured_data(F.col("spans")).alias("sd")).collect()[0]["sd"]
    assert list(sd["jsonLd"]) == []
    assert dict(sd["openGraph"]) == {}
    assert dict(sd["metaData"]) == {"language": ""}


def test_robots_directives_attribute_order_and_quote_forms(spark):
    from pyspark.sql import functions as F

    from eget_spark.functions.metadata import robots_directives

    rows = [
        (0, '<meta content="noindex" name="robots">'),          # reversed order
        (1, "<meta name='robots' content='nofollow'>"),         # single quotes
        (2, '<meta charset="x"><meta name="robots" id="r" content="none">'),
        (3, "<meta content='noindex, nofollow' name='robots'>"),
        (4, '<meta name="viewport" content="noindex">'),        # wrong tag: open
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    ni, nf = robots_directives(F.col("html"))
    got = {r["id"]: (r["ni"], r["nf"]) for r in
           df.select("id", ni.alias("ni"), nf.alias("nf")).collect()}
    assert got == {
        0: (True, False),
        1: (False, True),
        2: (True, True),
        3: (True, True),
        4: (False, False),
    }
