"""Soft-404 detection (operators/soft404.py)."""

from eget_spark.operators.soft404 import soft404_flags


def _pages(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_short_error_page_flagged(spark):
    rows = [(1, "404 Error: Page Not Found. Sorry.")]
    r = soft404_flags(_pages(spark, rows), "id", "text").collect()[0]
    assert r["has_404_pattern"] and r["too_short"] and r["is_soft404"]


def test_banner_on_long_page_not_flagged(spark):
    long = "This page does not exist, said the archived novel. " + "word " * 200
    r = soft404_flags(_pages(spark, [(1, long)]), "id", "text").collect()[0]
    assert r["has_404_pattern"] and not r["too_short"] and not r["is_soft404"]


def test_short_page_without_banner_not_flagged(spark):
    r = soft404_flags(_pages(spark, [(1, "short but real content")]), "id", "text").collect()[0]
    assert not r["has_404_pattern"] and r["too_short"] and not r["is_soft404"]


def test_all_banner_variants(spark):
    rows = [
        (1, "PAGE NOT FOUND"),
        (2, "404 error"),
        (3, "Error 404"),
        (4, "this page does not exist"),
        (5, "content no longer available"),
        (6, "nothing was found here"),
        (7, "nothing found"),
        (8, "perfectly ordinary page"),
    ]
    out = {r["id"]: r["has_404_pattern"] for r in soft404_flags(
        _pages(spark, rows), "id", "text").collect()}
    assert out == {1: True, 2: True, 3: True, 4: True, 5: True,
                   6: True, 7: True, 8: False}


def test_threshold_boundary(spark):
    exact = "x" * 200
    below = "404 error " + "x" * 389  # 399 chars < 400 relaxed gate
    at = "404 error " + "x" * 390     # 400 chars, NOT < 400
    rows = [(1, exact), (2, below), (3, at)]
    out = {r["id"]: r.asDict() for r in soft404_flags(
        _pages(spark, rows), "id", "text", min_chars=200).collect()}
    assert not out[1]["too_short"]
    assert out[2]["is_soft404"]
    assert not out[3]["is_soft404"]
