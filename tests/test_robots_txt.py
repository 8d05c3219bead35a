"""Raw robots.txt parsing (sources/robots_txt.py)."""

from __future__ import annotations

from eget_spark.sources.robots_txt import (
    parse_robots,
    parse_robots_body,
    robots_sitemap_roots,
)

BODY = """
# global
Sitemap: https://a.example.org/sm-root.xml

User-agent: googlebot
User-agent: eget
Disallow: /private/
Crawl-delay: 2.5

User-agent: *
Allow: /public/*.html$
Disallow: /tmp/
Disallow:
Crawl-delay: 1
Sitemap: https://a.example.org/sm-2.xml

User-agent: eget-crawler
Disallow: /only-for-eget-crawler/
"""


def test_star_group_for_unknown_agent():
    p = parse_robots_body(BODY, agent="randombot")
    assert p["rules"] == [(True, "/public/*.html$"), (False, "/tmp/")]
    assert p["disallow_prefixes"] == ["/tmp/"]  # wildcard rule not a prefix
    assert p["crawl_delay"] == 1.0
    assert p["sitemaps"] == [
        "https://a.example.org/sm-root.xml",
        "https://a.example.org/sm-2.xml",
    ]


def test_most_specific_agent_wins():
    # 'eget-crawler' matches both 'eget' (len 4) and 'eget-crawler'
    # (len 12): only the longest-token group applies
    p = parse_robots_body(BODY, agent="eget-crawler")
    assert p["rules"] == [(False, "/only-for-eget-crawler/")]
    assert p["crawl_delay"] is None
    p2 = parse_robots_body(BODY, agent="eget")
    assert p2["rules"] == [(False, "/private/")]
    assert p2["crawl_delay"] == 2.5


def test_consecutive_agent_lines_share_one_group():
    p = parse_robots_body(BODY, agent="googlebot")
    assert p["rules"] == [(False, "/private/")]


def test_rules_before_any_group_are_ignored():
    p = parse_robots_body("Disallow: /x/\nUser-agent: *\nDisallow: /y/")
    assert p["rules"] == [(False, "/y/")]


def test_empty_body_and_garbage():
    assert parse_robots_body("")["rules"] == []
    assert parse_robots_body("no colons here\n\n")["rules"] == []
    p = parse_robots_body("User-agent: *\nCrawl-delay: soon")
    assert p["crawl_delay"] is None


def test_distributed_parse_feeds_robots_allowed(spark):
    from pyspark.sql import functions as F

    from eget_spark.operators.links import robots_allowed

    bodies = [
        ("h0.example.org", "User-agent: *\nDisallow: /p/00\nSitemap: https://h0.example.org/sm.xml"),
        ("h1.example.org", "User-agent: *\nAllow: /p/01*\nDisallow: /p/*"),
        ("h2.example.org", ""),
    ]
    robots = parse_robots(
        spark.createDataFrame(bodies, "host string, body string")
    )
    urls = spark.createDataFrame(
        [
            ("https://h0.example.org/p/0001", "h0.example.org"),
            ("https://h0.example.org/q/keep", "h0.example.org"),
            ("https://h1.example.org/p/0199", "h1.example.org"),
            ("https://h1.example.org/p/0999", "h1.example.org"),
            ("https://h2.example.org/p/0001", "h2.example.org"),
        ],
        "url string, host string",
    )
    kept = {r["url"] for r in robots_allowed(urls, robots).collect()}
    assert kept == {
        "https://h0.example.org/q/keep",   # /p/00 prefix blocked
        "https://h1.example.org/p/0199",   # Allow /p/01* beats Disallow /p/*
        "https://h2.example.org/p/0001",   # empty robots: all allowed
    }
    roots = {r["url"] for r in robots_sitemap_roots(robots).collect()}
    assert roots == {"https://h0.example.org/sm.xml"}
