"""X7 span->markdown assembly: engine flat-pass kernel vs the oracle's
reference-shaped tree renderer (document_structure.py:67-186) on the full
small corpus, plus golden strings for each element type."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.functions.spans import assemble_markdown, link_targets, span_kind_counts
from tests.oracle import oracle_markdown


def test_assembly_equals_oracle_on_corpus(spark, docs_small, corpus_small):
    got = {
        r["doc_id"]: r["md"]
        for r in docs_small.select(
            "doc_id", assemble_markdown(F.col("spans")).alias("md")
        ).collect()
    }
    assert len(got) == len(corpus_small)
    for doc_id, spans in corpus_small.items():
        assert got[doc_id] == oracle_markdown(spans), doc_id


def _mk(spark, spans):
    return spark.createDataFrame(
        [(spans,)],
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def _md(spark, spans):
    df = _mk(spark, spans)
    return df.select(assemble_markdown(F.col("spans")).alias("m")).collect()[0]["m"]


def test_golden_heading_nesting_and_list_indent(spark):
    spans = [
        ("heading", "# Top", "", 0),
        ("list", "a\nb", "", 1),
        ("heading", "## Sub", "", 2),
        ("list", "1. x\n2. y", "", 3),
        ("heading", "# Next", "", 4),
        ("list", "c", "", 5),
    ]
    # list under one heading: indent 4; under two: 8; join-strip removes
    # the first line's indent (document_structure.py:87 `part.strip()`)
    assert _md(spark, spans) == (
        "# Top\n\n- a\n    - b\n\n## Sub\n\n1. x\n        2. y\n\n# Next\n\n- c"
    )


def test_golden_table_alignment_row(spark):
    spans = [("table", "h1\th2\naa|a\tb", "", 0)]
    # widths from raw text ('aa|a' = 4), pipes escaped after padding calc,
    # left-align separator ':---' (document_structure.py:160-171)
    assert _md(spark, spans) == "| h1   | h2 |\n|:----|:--|\n| aa\\|a | b  |"


def test_golden_code_math_image_separator_link(spark):
    spans = [
        ("code", "python\nx = 1", "", 0),
        ("math", "e=mc^2", "", 1),
        ("image", "alt text", "img://deadbeef", 2),
        ("separator", "", "", 3),
        ("link", "anchor", "https://x.com/y", 4),
        ("metadata", '{"title": "t"}', "", 5),
    ]
    assert _md(spark, spans) == (
        "```python\nx = 1\n```\n\n$e=mc^2$\n\n![alt text](img://deadbeef)"
        "\n\n---\n\n[anchor](https://x.com/y)"
    )


def test_link_targets_and_kind_counts(spark):
    spans = [
        ("paragraph", "p", "", 0),
        ("link", "a", "https://x.com/1", 1),
        ("link", "b", "/rel", 2),
        ("image", "i", "img://x", 3),
    ]
    df = _mk(spark, spans)
    row = df.select(
        link_targets(F.col("spans")).alias("t"),
        span_kind_counts(F.col("spans"), "link").alias("nl"),
        span_kind_counts(F.col("spans"), "image").alias("ni"),
    ).collect()[0]
    assert row["t"] == ["https://x.com/1", "/rel"]
    assert row["nl"] == 2 and row["ni"] == 1


def test_link_anchor_pairs(spark):
    from eget_spark.functions.spans import link_anchor_pairs
    from pyspark.sql import functions as F

    mk = lambda kind, text, ref, off: (kind, text, ref, off)
    df = spark.createDataFrame(
        [([mk("heading", "h", "", 0), mk("link", "click", "https://a/1", 1),
           mk("text", "t", "", 2), mk("link", "more", "https://a/2", 3)],)],
        "spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    got = df.select(link_anchor_pairs(F.col("spans")).alias("p")).first()["p"]
    assert [(r["target"], r["anchor"]) for r in got] == [
        ("https://a/1", "click"), ("https://a/2", "more")
    ]
