"""Link admission filter chain F1-F5 (SURVEY.md §2.2).

Reference order (link_extractor.py:105-121): normalize (F1) -> same-domain
(F2) -> exclude patterns (F3) -> include patterns (F4) -> robots (F5).
Filters are pure predicates, so order only matters for cost; Catalyst
reorders freely.

Regex dialect (SURVEY.md §7.4): the reference compiles *Python* `re`
patterns (link_extractor.py:24-25). Spark's `rlike` is Java regex.  For
patterns in a conservative common-dialect subset we emit native `rlike`
(stays in whole-stage codegen); otherwise we fall back to an
Arrow-vectorized pandas UDF running Python `re` itself — exactness first,
speed when safe.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import host_of, path_of

# Constructs whose semantics match between java.util.regex and Python re.
# Conservative: anything outside this alphabet falls back to the Python UDF.
_SAFE_RE = re.compile(r"^[A-Za-z0-9_\-/\\.\^\$\*\+\?\(\)\[\]\|\{\},:=<>! ]*$")
_UNSAFE_TOKENS = ("(?P", "(?#", "(?<", "(?i", "(?m", "(?s", "(?x")
# \d \w \s \b (and \D \W \S \B, \A \Z, backrefs \1…) diverge: Java character
# classes are ASCII-only while Python re is Unicode — any backslash followed
# by an alphanumeric routes to the Python-re UDF (escaped punctuation like
# \. \? stays safe).  Round-1 advice fix.
_UNSAFE_ESCAPE_RE = re.compile(r"\\[A-Za-z0-9]")


def java_safe(pattern: str) -> bool:
    return (
        bool(_SAFE_RE.match(pattern))
        and not _UNSAFE_ESCAPE_RE.search(pattern)
        and not any(t in pattern for t in _UNSAFE_TOKENS)
    )


def _python_search_udf(patterns: list[str]):
    compiled = [re.compile(p) for p in patterns]

    @F.pandas_udf(T.BooleanType())
    def any_match(urls: pd.Series) -> pd.Series:
        return urls.map(
            lambda u: u is not None and any(c.search(u) for c in compiled)
        )

    return any_match


def matches_any(url: Column, patterns: list[str]) -> Column:
    """`any(p.search(url) for p in patterns)` (link_extractor.py:83-92)."""
    if not patterns:
        return F.lit(False)
    if all(java_safe(p) for p in patterns):
        cond = F.lit(False)
        for p in patterns:
            cond = cond | url.rlike(p)
        return cond
    return _python_search_udf(patterns)(url)


def same_domain(url: Column, base_domain: str) -> Column:
    """F2: exact netloc equality with the seed's domain
    (link_extractor.py:79-81)."""
    return host_of(url) == F.lit(base_domain)


def robots_allowed(
    candidates: DataFrame,
    robots: DataFrame | None,
    respect_robots: bool = True,
    url_col: str = "url",
) -> DataFrame:
    """F5/J2: drop URLs whose path starts with a disallowed prefix.

    Broadcast-joins the (tiny) robots table on host — the Spark analogue of
    the per-crawl RobotExclusionRulesParser singleton
    (link_extractor.py:27-46). Missing host row or respect_robots=False =>
    always allowed (mirrors the reference's failed-robots-fetch fallback).
    The prefix test is a higher-order `exists` — zero Python.
    """
    if not respect_robots or robots is None:
        return candidates
    url = F.col(url_col)
    joined = candidates.join(
        F.broadcast(robots.select("host", "disallow_prefixes")),
        host_of(url) == robots["host"],
        "left",
    ).drop(robots["host"])
    disallowed = F.exists(
        F.col("disallow_prefixes"),
        lambda p: path_of(url).startswith(p),
    )
    return (
        joined.where(F.col("disallow_prefixes").isNull() | ~disallowed)
        .drop("disallow_prefixes")
    )


def should_include(url: Column, base_domain: str, exclude: list[str], include: list[str]) -> Column:
    """F2+F3+F4 conjunction (link_extractor.py:68-92)."""
    cond = same_domain(url, base_domain)
    if exclude:
        cond = cond & ~matches_any(url, exclude)
    if include:
        cond = cond & matches_any(url, include)
    return cond
