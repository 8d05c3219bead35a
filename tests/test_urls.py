"""F1 normalization parity: engine pandas UDF vs urllib ground truth
(link_extractor.py:48-67) on table-driven edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eget_spark.functions.urls import (
    cache_key,
    host_of,
    normalize_absolute_expr,
    normalize_url,
)
from tests.oracle import normalize_url as oracle_normalize

CASES = [
    ("https://a.com/p/1#frag", "https://a.com/"),
    ("https://a.com/p/1?q=2", "https://a.com/"),
    ("https://a.com/p/1;params?q=2#f", "https://a.com/"),
    ("/abs/path", "https://a.com/p/base"),
    ("rel/path", "https://a.com/p/base"),
    ("rel/path", "https://a.com/p/"),
    ("../up", "https://a.com/p/x/y"),
    ("", "https://a.com/p/base"),
    ("#only-frag", "https://a.com/p/base?q=1"),
    ("?only-query", "https://a.com/p/base"),
    ("//other.com/x", "https://a.com/"),
    ("HTTPS://A.com/X", "https://a.com/"),
    ("mailto:x@y.com", "https://a.com/"),
    ("javascript:void(0)", "https://a.com/"),
    ("https://a.com:8080/p", "https://a.com/"),
]


def test_normalize_matches_urllib(spark):
    df = spark.createDataFrame(CASES, "href string, base string")
    got = df.withColumn("n", normalize_url(F.col("href"), F.col("base"))).collect()
    for row in got:
        assert row["n"] == oracle_normalize(row["href"], row["base"]), row


def test_normalize_absolute_expr_agrees_on_absolute(spark):
    urls = [
        ("https://a.com/p/00001#frag",),
        ("https://a.com/p/00001?q=1",),
        ("https://a.com/p/00001",),
    ]
    df = spark.createDataFrame(urls, "u string")
    rows = df.select(
        normalize_absolute_expr(F.col("u")).alias("fast"),
        normalize_url(F.col("u"), F.lit("https://a.com/")).alias("exact"),
    ).collect()
    for r in rows:
        assert r["fast"] == r["exact"]


def test_host_of(spark):
    df = spark.createDataFrame(
        [("https://h3.example.com/p/00001",), ("https://a.com:8080/x",)], "u string"
    )
    rows = df.select(host_of(F.col("u")).alias("h")).collect()
    assert rows[0]["h"] == "h3.example.com"
    assert rows[1]["h"] == "a.com:8080"


def test_cache_key_matches_hashlib(spark):
    import hashlib

    url, opts = "https://a.com/p/1", '{"only_main": true}'
    expect = hashlib.sha256(f"{url}|{opts}".encode()).hexdigest()
    df = spark.createDataFrame([(url, opts)], "u string, o string")
    got = df.select(cache_key(F.col("u"), F.col("o")).alias("k")).collect()[0]["k"]
    assert got == expect


def test_java_safe_rejects_ascii_class_escapes():
    """Java \\d/\\w/\\s are ASCII-only; Python re is Unicode — such patterns
    must route to the Python-re UDF (round-1 advice fix)."""
    from eget_spark.operators.links import java_safe

    assert not java_safe(r"/p/\d+")
    assert not java_safe(r"\w+foo")
    assert not java_safe(r"a\sb")
    assert not java_safe(r"end\b")
    assert not java_safe(r"(a)\1")
    assert java_safe(r"/p/[0-9]+")  # explicit class: dialect-identical
    assert java_safe(r"foo\.bar")  # escaped punctuation stays safe
    assert java_safe(r"^https://x/.*$")


def test_matches_any_unicode_digits(spark):
    """Python \\d matches Arabic-Indic digits; the engine must agree with the
    reference's Python re, not Java's ASCII classes."""
    from eget_spark.operators.links import matches_any

    df = spark.createDataFrame(
        [("https://x/p/١٢٣",), ("https://x/p/abc",)], "url string"
    )
    got = {
        r["url"]
        for r in df.where(matches_any(F.col("url"), [r"/p/\d+$"])).collect()
    }
    assert got == {"https://x/p/١٢٣"}
