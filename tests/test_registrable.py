"""Registrable-domain extraction (functions/urls.registrable_domain)."""

import pyspark.sql.functions as F

from eget_spark.functions.urls import registrable_domain


def _run(spark, hosts):
    df = spark.createDataFrame([(i, h) for i, h in enumerate(hosts)], "i long, h string")
    rows = df.select("i", registrable_domain(F.col("h")).alias("r")).collect()
    return [r["r"] for r in sorted(rows, key=lambda r: r["i"])]


def test_two_label_suffixes_keep_three(spark):
    assert _run(spark, [
        "www.example.co.uk",
        "a.b.example.com.au",
        "news.site.co.jp",
        "shop.example.com.br",
    ]) == ["example.co.uk", "example.com.au", "site.co.jp", "example.com.br"]


def test_default_rule_keeps_two(spark):
    assert _run(spark, [
        "en.wikipedia.org",
        "example.com",
        "deep.sub.tree.example.io",
    ]) == ["wikipedia.org", "example.com", "example.io"]


def test_dotless_and_case(spark):
    assert _run(spark, ["localhost", "WWW.Example.CO.UK"]) == [
        "localhost", "example.co.uk",
    ]


def test_suffix_itself_not_truncated(spark):
    # a bare public suffix has no registrable label; default rule output
    # is the suffix itself (pinned behavior)
    assert _run(spark, ["co.uk"]) == ["co.uk"]
