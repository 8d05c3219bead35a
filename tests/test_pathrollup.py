"""URL path-prefix rollup (operators/pathrollup.py)."""

import pytest

from eget_spark.operators.pathrollup import path_prefix_counts


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_prefix_multiset(spark):
    urls = [
        "https://a.org/x/y/z",
        "https://a.org/x/y/w",
        "https://a.org/x/q",
        "https://a.org/",
        "https://a.org",
    ]
    out = {(r["prefix"]): (r["depth"], r["n_pages"]) for r in
           path_prefix_counts(_pages(spark, urls)).collect()}
    assert out["/x"] == (1, 3)
    assert out["/x/y"] == (2, 2)
    assert out["/x/y/z"] == (3, 1)
    assert out["/x/q"] == (2, 1)
    assert out["/"] == (0, 2)


def test_depth_cap(spark):
    out = path_prefix_counts(
        _pages(spark, ["https://a.org/1/2/3/4/5"]), max_depth=2
    ).collect()
    assert sorted(r["prefix"] for r in out) == ["/1", "/1/2"]
    with pytest.raises(ValueError):
        path_prefix_counts(_pages(spark, []), max_depth=0)


def test_hosts_separate(spark):
    out = path_prefix_counts(
        _pages(spark, ["https://a.org/x", "https://b.org/x"])
    ).collect()
    assert len(out) == 2
    assert all(r["n_pages"] == 1 for r in out)
