"""Canonical engine schemas (SURVEY.md §1.3, BASELINE.json input_hint).

The interleaved corpus table is the `input_hint` shape:
``doc_id:string, spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>``.
`kind` values mirror the reference ElementType enum
(/root/reference/services/converters/document_structure.py:5-16) plus
``link`` for harvested anchors (link_extractor.py:107-121 analogue).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

SPANS_TYPE = T.ArrayType(SPAN_STRUCT)

# Synthetic corpus (FIXTURES.md §1): engine reads doc_id+spans; host and
# true_out_links are generation-time ground truth for tests.
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPANS_TYPE, False),
        T.StructField("host", T.StringType(), False),
        T.StructField("true_out_links", T.ArrayType(T.StringType()), False),
    ]
)

# Frontier working set (SURVEY.md §1.1 'URL frontier'); seq is the global
# admission sequence number that reproduces the reference FIFO order
# (queue_manager.py:34-57 admission under the §2.10 determinism contract).
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay", T.DoubleType(), False),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

# Emitted crawl output (reference CrawledPage, models/crawler_response.py:14-24,
# plus lineage columns for checkpoint/resume).
CRAWLED_SCHEMA_DDL = (
    "url string, host string, depth int, parent_url string, seq long, "
    "round int, status string, markdown string"
)

SPAN_KINDS = (
    "heading",
    "paragraph",
    "list",
    "table",
    "image",
    "code",
    "math",
    "metadata",
    "footnote",
    "citation",
    "separator",
    "link",
)
