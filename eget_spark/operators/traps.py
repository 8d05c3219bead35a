"""Spider-trap analytics: URL-template mining per host.

Crawl traps (calendars, faceted search, session-id paths) generate
unbounded URL families that differ only in numeric/hex path segments.
Mining the frontier or seen set for dominant URL *templates* — the URL
with digit runs and long hex runs collapsed to placeholders — surfaces
them before they eat the politeness budget, and feeds the per-host cap /
exclude-pattern controls (`CrawlConfig.max_pages_per_host`,
`exclude_patterns`) with evidence instead of guesses.

Pure column expressions (regexp_replace + aggregates), zero Python; one
shuffle keyed on (host, template), then a tiny per-host aggregate — at
10^10 URLs the template collapse is map-side and the per-host result is
O(hosts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_of, registrable_domain


def url_template(url) -> "F.Column":
    """Collapse volatile URL segments: digit runs -> N, >=8-char hex runs
    -> H (session ids / content hashes).  Query strings keep their keys
    but lose their values (the classic faceted-search trap shape)."""
    c = F.col(url) if isinstance(url, str) else url
    t = F.regexp_replace(c, r"[0-9a-fA-F]{8,}", "H")
    t = F.regexp_replace(t, r"\d+", "N")
    return F.regexp_replace(t, r"=([^&#/]*)", "=V")


def template_counts(
    urls: DataFrame, url_col: str = "url", host_col: str | None = None
) -> DataFrame:
    """(host, template, n_urls) — the template histogram."""
    host = F.col(host_col) if host_col else host_of(F.col(url_col))
    return (
        urls.select(host.alias("host"), url_template(F.col(url_col)).alias("template"))
        .groupBy("host", "template")
        .agg(F.count("*").cast("long").alias("n_urls"))
    )


def trap_scores(
    urls: DataFrame, url_col: str = "url", host_col: str | None = None
) -> DataFrame:
    """Per host: total URLs, distinct templates, the dominant template and
    its share.  ``trap_score`` (dominant template's fraction of the
    host's URLs) near 1.0 with a large n_urls = one URL family dominates
    the host — the trap signature."""
    tc = template_counts(urls, url_col, host_col)
    return tc.groupBy("host").agg(
        F.sum("n_urls").cast("long").alias("n_urls"),
        F.count("*").cast("long").alias("n_templates"),
        F.max_by("template", F.struct("n_urls", "template")).alias("top_template"),
        F.max("n_urls").cast("long").alias("top_template_n"),
        F.round(F.max("n_urls") / F.sum("n_urls"), 6).alias("trap_score"),
    )


def path_cycle_flags(
    df: DataFrame,
    url_col: str = "url",
    max_repeat: int = 2,
    max_depth: int = 12,
) -> DataFrame:
    """Per-URL structural trap detector — the zero-shuffle complement to
    the statistical :func:`trap_scores`: a URL is flagged WITHOUT seeing
    any other URL, so the filter can run at admission time inside the
    crawl loop (before the frontier pays for the fetch), exactly like the
    classic Heritrix "path-repetition" TooManyPathSegments/
    PathologicalPath rules (public crawler lore: ``/a/b/a/b/a/b/...``
    symlink loops and calendar recursions produce paths where the same
    segment recurs).

    Pinned semantics (engine-portable, oracle-checked):
    - ``segments`` = non-empty '/'-separated path segments of the URL
      after stripping scheme://host and any ?query/#fragment;
    - ``depth`` = number of segments;
    - ``max_seg_repeat`` = the highest multiplicity of any single segment
      value within the path (1 for an all-distinct path, 0 for an empty
      one);
    - ``is_trap`` = max_seg_repeat > max_repeat OR depth > max_depth.

    Scale shape: pure projection — split + higher-order array expressions
    (the per-row cost is O(depth^2) with depth <= a few dozen); NO
    explode, NO groupBy, NO join, NO Python.  At 10^10 URLs this is the
    only trap control with zero coordination cost.
    """
    c = F.col(url_col)
    # scheme matched case-insensitively (RFC 3986 §3.1 — 'HTTP://' is
    # valid and does appear in real link extractions; host_of does the
    # same): a miss here would zero the depth and wave the trap through
    path = F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([^?#]*)", 1
    )
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    rep = F.aggregate(
        segs,
        F.lit(0),
        lambda acc, x: F.greatest(
            acc, F.size(F.filter(segs, lambda y: y == x))
        ),
    )
    return (
        df.withColumn("depth", F.size(segs).cast("long"))
        .withColumn("max_seg_repeat", rep.cast("long"))
        .withColumn(
            "is_trap",
            (F.col("max_seg_repeat") > F.lit(int(max_repeat)))
            | (F.col("depth") > F.lit(int(max_depth))),
        )
    )


def subdomain_farm_flags(
    hosts: DataFrame,
    host_col: str = "host",
    min_hosts: int = 20,
    max_avg_pages_permille: int = 2000,
) -> DataFrame:
    """DNS-level trap family: wildcard-subdomain farms.  A calendar trap
    multiplies PATHS under one host (caught by :func:`path_cycle_flags` /
    :func:`trap_scores`); a subdomain farm multiplies HOSTS under one
    registrable domain (``u1.spam.example``, ``u2.spam.example``, ... via
    wildcard DNS), dodging every per-host control — per-host page caps,
    per-host politeness, per-host templates all see singleton hosts.
    The tell: a domain with MANY distinct hosts averaging ~1 page each.

    Pinned semantics (int64, oracle-checked): group rows (one per fetched
    page) by ``registrable_domain(host)`` (the PSL-lite eTLD+1 of
    functions/urls.py);
    ``avg_pages_permille = 1000 * n_pages div n_hosts``;
    ``farm = n_hosts >= min_hosts AND avg_pages_permille <=
    max_avg_pages_permille``.

    Feeds the same admission controls as trap_scores, but keyed on the
    DOMAIN: a flagged domain gets ONE politeness/budget bucket for all
    its subdomains (exactly why registrable_domain exists).

    Scale shape: ONE map-side-combined groupBy on the derived domain
    (count + two-phase distinct-host count); the domain is pure column
    algebra off the host string — no PSL lookup join.
    """
    d = registrable_domain(F.col(host_col))
    return (
        hosts.groupBy(d.alias("domain"))
        .agg(
            F.countDistinct(F.col(host_col)).cast("long").alias("n_hosts"),
            F.count(F.lit(1)).cast("long").alias("n_pages"),
        )
        .select(
            "domain",
            "n_hosts",
            "n_pages",
            F.expr("(1000 * n_pages) div n_hosts").cast("long").alias(
                "avg_pages_permille"
            ),
            (
                (F.col("n_hosts") >= F.lit(int(min_hosts)))
                & (
                    F.expr("(1000 * n_pages) div n_hosts")
                    <= F.lit(int(max_avg_pages_permille))
                )
            ).alias("farm"),
        )
    )
