"""Facade parity: scrape/chunk behave like the reference endpoints."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark import api
from eget_spark.synth import doc_url
from tests.oracle import oracle_markdown


def test_scrape_success_and_failure(spark, docs_small, corpus_small):
    urls = spark.createDataFrame(
        [(doc_url(0, 0),), (doc_url(0, 1),), ("https://h0.example.com/p/99999",)],
        "url string",
    )
    rows = {r["url"]: r for r in api.scrape(urls, docs_small).collect()}
    assert rows[doc_url(0, 0)]["success"]
    assert rows[doc_url(0, 0)]["markdown"] == oracle_markdown(corpus_small[doc_url(0, 0)])
    sd = rows[doc_url(0, 0)]["structured_data"]
    assert sd["metaData"]["title"].endswith("page 00000")
    assert not rows["https://h0.example.com/p/99999"]["success"]
    assert rows["https://h0.example.com/p/99999"]["markdown"] is None
    # links = raw hrefs of link spans
    want_links = [
        s["media_ref"] for s in sorted(corpus_small[doc_url(0, 1)], key=lambda s: s["offset"])
        if s["kind"] == "link"
    ]
    assert rows[doc_url(0, 1)]["links"] == want_links


def test_chunk_endpoint_semantic_and_sentence(spark, docs_small, corpus_small):
    from eget_spark.operators.chunker import semantic_chunks, sentence_chunks

    import re

    urls = spark.createDataFrame([(doc_url(0, 2),)], "url string")
    got = api.chunk(urls, docs_small, "semantic").orderBy("position").collect()
    # reproduce the full reference path in pure python: assemble -> clean -> chunk
    md = oracle_markdown(corpus_small[doc_url(0, 2)])
    cleaned = re.sub(r"\s+", " ", md)
    cleaned = re.sub(r"(#{1,6})([^#\s])", r"\1 \2", cleaned)
    cleaned = re.sub(r"\n{3,}", "\n\n", cleaned)
    cleaned = re.sub(r"(\n\s*)-([^\s])", r"\1- \2", cleaned)
    cleaned = re.sub(r"(?s)<!--.*?-->", "", cleaned)
    cleaned = cleaned.replace("&nbsp;", " ").replace("\xa0", " ")
    cleaned = "\n".join(line.rstrip() for line in cleaned.split("\n"))
    want = semantic_chunks(cleaned)
    assert [(r["position"], r["content"], r["type"]) for r in got] == [
        (c["position"], c["content"], c["type"]) for c in want
    ]

    got_s = api.chunk(urls, docs_small, "sentence").orderBy("position").collect()
    want_s = sentence_chunks(cleaned)
    assert [(r["position"], r["content"]) for r in got_s] == [
        (c["position"], c["content"]) for c in want_s
    ]


def test_scrape_html_pipeline(spark):
    html = "<html><body><main><h1>T</h1><p>body <a href='/x'>a</a></p></main></body></html>"
    pages = spark.createDataFrame([("u1", html)], "url string, html string")
    row = api.scrape_html(pages).collect()[0]
    assert row["markdown"].startswith("# T")
    assert row["links"] == ["/x"]
