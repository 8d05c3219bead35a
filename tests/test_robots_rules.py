"""F5 full-dialect robots rules: RFC 9309 / GYM2008 wildcard semantics as
implemented by RobotExclusionRulesParser (the reference's parser,
link_extractor.py:27,46) — `*` wildcards, `$` end anchors, Allow rules,
first-match-in-order decision. Goldens hand-derived from the library's
is_url_allowed contract (the library itself is not in this environment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eget_spark.operators.links import (
    _compile_robots_pattern,
    robots_allowed,
)

RULES_SCHEMA = (
    "host string, disallow_prefixes array<string>, crawl_delay double, "
    "rules array<struct<allow:boolean,pattern:string>>"
)


def _run(spark, robots_rows, urls):
    robots = spark.createDataFrame(robots_rows, RULES_SCHEMA)
    cand = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["url"] for r in robots_allowed(cand, robots).collect()}


@pytest.mark.parametrize(
    "pattern,path,match",
    [
        ("/private", "/private/x", True),  # prefix (match from start)
        ("/private", "/x/private", False),  # not anchored mid-string
        ("/*.pdf", "/docs/file.pdf", True),  # * spans directories
        ("/*.pdf", "/docs/file.pdfx", True),  # no $ -> prefix after wildcard
        ("/*.pdf$", "/docs/file.pdfx", False),  # $ anchors the end
        ("/*.pdf$", "/docs/file.pdf", True),
        ("/a*b*c", "/aXXbYYc", True),
        ("/a*b*c", "/acb", False),
        ("/exact$", "/exact", True),
        ("/exact$", "/exact/", False),
        ("/", "/anything", True),  # disallow-all
    ],
)
def test_pattern_dialect(pattern, path, match):
    assert bool(_compile_robots_pattern(pattern).match(path)) == match


def test_first_match_in_order_wins(spark):
    # Allow listed before Disallow: the allow wins for its subtree
    rows = [
        (
            "h.x",
            [],
            0.0,
            [(True, "/pub/open"), (False, "/pub"), (False, "/*.zip$")],
        )
    ]
    got = _run(
        spark,
        rows,
        [
            "https://h.x/pub/open/a",  # allow rule matches first
            "https://h.x/pub/closed",  # disallow /pub
            "https://h.x/data/x.zip",  # wildcard disallow
            "https://h.x/data/x.zipper",  # $ anchor: allowed
            "https://h.x/other",  # no rule matches -> allowed
        ],
    )
    assert got == {
        "https://h.x/pub/open/a",
        "https://h.x/data/x.zipper",
        "https://h.x/other",
    }


def test_empty_pattern_matches_nothing(spark):
    rows = [("h.x", [], 0.0, [(False, "")])]
    got = _run(spark, rows, ["https://h.x/a"])
    assert got == {"https://h.x/a"}


def test_null_rules_fall_back_to_prefixes(spark):
    rows = [
        ("a.x", ["/no"], 0.0, None),  # prefix dialect host
        ("b.x", [], 0.0, [(False, "/*.tmp$")]),  # wildcard dialect host
    ]
    got = _run(
        spark,
        rows,
        ["https://a.x/no/1", "https://a.x/yes", "https://b.x/f.tmp", "https://b.x/f.txt", "https://c.x/any"],
    )
    assert got == {"https://a.x/yes", "https://b.x/f.txt", "https://c.x/any"}


def test_q05_prefix_path_unchanged(spark, robots_small):
    """The rules column is optional: tables without it take the pure-JVM
    prefix path (q05's shape)."""
    cand = spark.createDataFrame(
        [("https://h1.example.com/p/00012",), ("https://h1.example.com/p/00100",)],
        "url string",
    )
    got = {r["url"] for r in robots_allowed(cand, robots_small).collect()}
    assert got == {"https://h1.example.com/p/00100"}


def test_pattern_translation_property():
    """Property: the regex translation agrees with an INDEPENDENT dynamic-
    programming wildcard matcher on random patterns/paths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def dp_match(pattern: str, path: str) -> bool:
        # independent matcher: '*' spans any chars; trailing '$' anchors;
        # otherwise prefix-match from the start. Position-set DP so
        # overlapping segment occurrences are handled exactly.
        anchored = pattern.endswith("$")
        if anchored:
            pattern = pattern[:-1]
        segs = pattern.split("*")
        if not path.startswith(segs[0]):
            return False
        positions = {len(segs[0])}
        for seg in segs[1:]:
            new: set[int] = set()
            for p in positions:
                if seg == "":
                    new.update(range(p, len(path) + 1))
                else:
                    start = p
                    while (i := path.find(seg, start)) >= 0:
                        new.add(i + len(seg))
                        start = i + 1
            positions = new
            if not positions:
                return False
        return (len(path) in positions) if anchored else True

    alphabet = "ab/.7*"
    paths = st.text(alphabet="ab/.7", min_size=0, max_size=12)
    pats = st.text(alphabet=alphabet, min_size=1, max_size=8).map(
        lambda s: s + ("$" if len(s) % 2 else "")
    )

    @settings(max_examples=300, deadline=None)
    @given(pats, paths)
    def check(pattern, path):
        from eget_spark.operators.links import _compile_robots_pattern

        got = bool(_compile_robots_pattern(pattern).match(path))
        assert got == dp_match(pattern, path), (pattern, path)

    check()
