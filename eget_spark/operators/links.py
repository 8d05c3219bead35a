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


def _compile_robots_pattern(pattern: str):
    """Robots path pattern -> anchored regex: `*` matches any chars, a
    trailing `$` anchors the end, everything else literal (the GYM2008
    wildcard syntax RobotExclusionRulesParser implements)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.compile(body + ("$" if anchored else ""))


def _rules_allowed_udf():
    cache: dict[str, re.Pattern] = {}

    def allowed(path: str, rules) -> bool:
        """RobotExclusionRulesParser.is_url_allowed semantics
        (link_extractor.py:46 via the library): rules checked in file
        order, FIRST matching rule decides (allow flag), no match =>
        allowed; an empty pattern matches nothing."""
        for r in rules:
            pat = r["pattern"]
            if not pat:
                continue
            c = cache.get(pat)
            if c is None:
                c = cache[pat] = _compile_robots_pattern(pat)
            if c.match(path or ""):
                return bool(r["allow"])
        return True

    @F.pandas_udf(T.BooleanType())
    def udf(path: pd.Series, rules: pd.Series) -> pd.Series:
        return pd.Series(
            [
                True if rl is None else allowed(p, rl)
                for p, rl in zip(path, rules)
            ]
        )

    return udf


def robots_allowed(
    candidates: DataFrame,
    robots: DataFrame | None,
    respect_robots: bool = True,
    url_col: str = "url",
) -> DataFrame:
    """F5/J2: drop URLs the host's robots rules disallow.

    Broadcast-joins the (tiny) robots table on host — the Spark analogue of
    the per-crawl RobotExclusionRulesParser singleton
    (link_extractor.py:27-46). Missing host row or respect_robots=False =>
    always allowed (mirrors the reference's failed-robots-fetch fallback).

    Two rule dialects:
    - ``disallow_prefixes: array<string>`` — plain prefix rules; the test
      is a higher-order `exists`, zero Python (the fast path).
    - optional ``rules: array<struct<allow:boolean, pattern:string>>`` —
      full RFC 9309 / GYM2008 rules with `*`/`$` wildcards and Allow
      precedence, evaluated first-match-in-order by an Arrow-vectorized
      UDF reproducing RobotExclusionRulesParser semantics.  Hosts with a
      null ``rules`` entry fall back to the prefix path, so the Python
      stage prices only wildcard-bearing hosts.
    """
    if not respect_robots or robots is None:
        return candidates
    url = F.col(url_col)
    has_rules = "rules" in robots.columns
    sel = ["host", "disallow_prefixes"] + (["rules"] if has_rules else [])
    joined = candidates.join(
        F.broadcast(robots.select(*sel)),
        host_of(url) == robots["host"],
        "left",
    ).drop(robots["host"])
    path = path_of(url)
    prefix_ok = F.col("disallow_prefixes").isNull() | ~F.exists(
        F.col("disallow_prefixes"), lambda p: path.startswith(p)
    )
    if has_rules:
        keep = F.when(
            F.col("rules").isNotNull(), _rules_allowed_udf()(path, F.col("rules"))
        ).otherwise(prefix_ok)
    else:
        keep = prefix_ok
    return joined.where(keep).drop("disallow_prefixes", *(["rules"] if has_rules else []))


def should_include(url: Column, base_domain: str, exclude: list[str], include: list[str]) -> Column:
    """F2+F3+F4 conjunction (link_extractor.py:68-92)."""
    cond = same_domain(url, base_domain)
    if exclude:
        cond = cond & ~matches_any(url, exclude)
    if include:
        cond = cond & matches_any(url, include)
    return cond
