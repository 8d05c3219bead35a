"""Raw robots.txt parsing — body text to the engine's robots table.

The reference parses robots.txt with Python's RobotFileParser wrapped by
its link extractor (/root/reference/services/crawler/link_extractor.py);
the engine's crawl plan consumes a STRUCTURED robots table (host,
disallow_prefixes, rules, crawl_delay — operators/links.robots_allowed).
This module is the bridge: fetched robots.txt BODIES -> that table, per
RFC 9309 (plus the de-facto Crawl-delay and Sitemap extensions):

- groups = consecutive ``User-agent:`` lines followed by rules; a group
  applies to our agent if any of its agent tokens is the most specific
  match (longest token that is a case-insensitive substring match;
  ``*`` is the fallback).  ALL groups at that specificity merge, in file
  order — the order robots_allowed's first-match evaluation pins.
- ``Allow``/``Disallow`` values keep their ``*``/``$`` wildcards (the
  rules column handles them); empty ``Disallow:`` means allow-everything
  and contributes no rule.  Plain no-wildcard Disallow prefixes are ALSO
  surfaced as ``disallow_prefixes`` so the zero-Python JVM fast path
  applies when no wildcard rule exists.
- ``Crawl-delay`` from the matched group (first wins); ``Sitemap`` is
  global (any group position), preserved in file order.

Parsing is one Arrow ``mapInPandas`` pass over (host, body) rows — the
same no-shuffle shape as the WARC/sitemap sources.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

PARSED_DDL = (
    "host string, disallow_prefixes array<string>, "
    "rules array<struct<allow:boolean, pattern:string>>, "
    "crawl_delay double, sitemaps array<string>"
)


def parse_robots_body(body: str, agent: str = "*") -> dict:
    """One robots.txt body -> {rules, disallow_prefixes, crawl_delay,
    sitemaps} for ``agent``."""
    groups: list[dict] = []  # {agents: [..], rules: [(allow, pattern)], delay}
    sitemaps: list[str] = []
    cur: dict | None = None
    last_was_agent = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                cur = {"agents": [], "rules": [], "delay": None}
                groups.append(cur)
            cur["agents"].append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            if val:
                sitemaps.append(val)
            continue
        if cur is None:
            continue  # rules before any User-agent line: no group, ignored
        if key in ("allow", "disallow"):
            if key == "disallow" and val == "":
                continue  # empty Disallow = allow all, no rule
            if val:
                cur["rules"].append((key == "allow", val))
        elif key == "crawl-delay" and cur["delay"] is None:
            try:
                cur["delay"] = float(val)
            except ValueError:
                pass

    # most specific agent match: longest matching token; '*' = specificity 0
    me = agent.lower()

    def spec(g: dict) -> int:
        best = -1
        for a in g["agents"]:
            if a == "*":
                best = max(best, 0)
            elif a and a in me:
                best = max(best, len(a))
        return best

    specs = [spec(g) for g in groups]
    top = max((s for s in specs if s >= 0), default=-1)
    rules: list[tuple[bool, str]] = []
    delay = None
    if top >= 0:
        for g, s in zip(groups, specs):
            if s == top:
                rules.extend(g["rules"])
                if delay is None:
                    delay = g["delay"]
    prefixes = [
        p for allow, p in rules
        if not allow and "*" not in p and "$" not in p
    ]
    return {
        "rules": rules,
        "disallow_prefixes": prefixes,
        "crawl_delay": delay,
        "sitemaps": sitemaps,
    }


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    agent: str = "*",
) -> DataFrame:
    """(host, body) rows -> the robots table robots_allowed consumes:
    (host, disallow_prefixes, rules, crawl_delay, sitemaps).  One Arrow
    pass, no shuffle."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for h, body in zip(b[host_col], b[body_col]):
                p = parse_robots_body(body or "", agent)
                rows.append(
                    (
                        h,
                        p["disallow_prefixes"],
                        [{"allow": a, "pattern": pat} for a, pat in p["rules"]],
                        p["crawl_delay"],
                        p["sitemaps"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "host", "disallow_prefixes", "rules",
                    "crawl_delay", "sitemaps",
                ],
            )

    return df.mapInPandas(run, PARSED_DDL)


def robots_sitemap_roots(parsed: DataFrame) -> DataFrame:
    """Distinct Sitemap directives -> (url) roots for
    :func:`eget_spark.sources.sitemaps.expand_sitemap_indexes` — the
    standard discovery chain robots.txt -> sitemap tree -> seed frontier."""
    from pyspark.sql import functions as F

    return (
        parsed.select(F.explode("sitemaps").alias("url"))
        .distinct()
    )
