"""URL operators: normalization (F1), host extraction (F2 input),
canonical hashing (X15/X17).

Reference semantics:
- normalization: ``urljoin(base, href)`` then strip fragment/params/query,
  ``None`` on parse failure — /root/reference/services/crawler/link_extractor.py:48-67
- cache key: ``sha256("url|{sorted options json}")`` —
  /root/reference/services/cache/cache_service.py:37-55

Two implementations of normalization are provided:
- `normalize_url` — Arrow-vectorized pandas UDF running the exact urllib
  logic (batch loop over a pd.Series; urllib is the reference's own parser,
  so this path is bit-exact, including its edge cases).
- `normalize_absolute_expr` — pure column expression fast path for hrefs
  already known to be absolute http(s) URLs (strips fragment then query);
  stays inside whole-stage codegen, used on the hot path when the corpus
  guarantees absolute links.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize_one(href: str | None, base: str | None) -> str | None:
    if href is None:
        return None
    try:
        parsed = urlparse(urljoin(base or "", href))
        return parsed._replace(fragment="", params="", query="").geturl()
    except (ValueError, AttributeError):
        return None


@F.pandas_udf(T.StringType())
def _normalize_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    # cache per batch: crawl batches repeat (base, href) prefixes heavily
    memo: dict[tuple, str | None] = {}
    out = []
    for h, b in zip(href, base):
        key = (h, b)
        if key not in memo:
            memo[key] = _normalize_one(h, b)
        out.append(memo[key])
    return pd.Series(out, dtype=object)


# guide §4.4: a filter on the UDF's output column (the crawl harvest's
# ``.where(url.isNotNull())``) otherwise DUPLICATES the evaluation into
# two ArrowEvalPython nodes — and the pushed-down copy lands below the
# harvest's coalesce, so every corpus partition pays a Python worker
# round-trip per crawl round (measured: the per-round sequencing stage's
# run-time was ~10x its CPU time, all Python channel wait).  The
# function is pure; non-determinism here only pins the plan.
_normalize_udf = _normalize_udf.asNondeterministic()


def normalize_url(href: Column, base: Column) -> Column:
    """F1: exact reference normalization (link_extractor.py:48-67)."""
    return _normalize_udf(href, base)


def normalize_absolute_expr(url: Column) -> Column:
    """F1 fast path for absolute http(s) URLs: drop #fragment and ?query.

    Equivalent to the urllib path whenever the input is already an absolute
    URL without ;params — guaranteed for engine-emitted doc_ids.
    """
    return F.regexp_replace(url, r"[#?].*$", "")


# hrefs on which `normalize_absolute_expr` is provably byte-identical to
# the urllib path of `_normalize_one` (urljoin returns an absolute
# lowercase-scheme href verbatim; geturl() reassembly is the identity on
# scheme://netloc/path; params need a ';'):
# - lowercase http(s) scheme, non-empty netloc
# - no ';' (params) and no ASCII whitespace/control/DEL before the first
#   '?'/'#' (urlsplit strips tab/newline anywhere and C0+space at the
#   ends; inside the dropped query/fragment they cannot matter)
# Everything else (relative links, exotic schemes, whitespace, params)
# takes the exact urllib pandas-UDF path.
SAFE_ABS_URL_RE = (
    r"(?s)^https?://[^/?#;\s\x00-\x1f\x7f]"
    r"[^;?#\s\x00-\x1f\x7f]*([?#].*)?$"
)


def host_of(url: Column) -> Column:
    """netloc extraction (link_extractor.py:23 `urlparse(url).netloc`).

    `parse_url(url,'HOST')` drops the port; the reference compares full
    netloc (incl. port/userinfo), so extract the authority component
    natively instead.
    """
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1)


def path_of(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))


def cache_key(url: Column, options_json: Column) -> Column:
    """X15: sha256 of 'url|options_json' (cache_service.py:37-55)."""
    return F.sha2(F.concat_ws("|", url, options_json), 256)


def url_hash64(url: Column) -> Column:
    """X17: 64-bit partition/bloom key for a canonical URL."""
    return F.xxhash64(url)


# PSL-lite: the multi-label public suffixes that actually dominate crawl
# traffic (the full Mozilla PSL is a runtime data file; this pinned subset
# covers the high-traffic ccTLD second-level registries so politeness
# grouping is right where it matters — en.wikipedia.org-style hostnames
# only need the default 1-label rule).  Suffixes are matched longest-first.
PSL_LITE = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.mx", "org.mx", "gob.mx",
    "co.za", "org.za", "gov.za",
    "com.tr", "org.tr", "gov.tr",
    "com.ar", "com.sg", "com.hk", "com.tw", "co.nz", "org.nz",
    "co.il", "org.il", "com.my", "com.ph", "com.vn", "com.eg",
]


def registrable_domain(host: Column) -> Column:
    """eTLD+1 of a hostname under the pinned PSL-lite table — the
    politeness/crawl-budget grouping key real crawlers use (rate-limiting
    `a.blogspot.co.uk` by its HOSTNAME lets one registrant dodge budgets
    via subdomains; grouping by registrable domain closes that).

    Semantics: if the host ends with a listed 2-label suffix, keep 3
    labels; else keep 2; hosts with fewer labels (bare TLDs, localhost)
    pass through unchanged.  IP literals pass through (no dots -> or
    all-numeric labels are left as-is only when they match the label
    count rule — callers route IPs around DNS grouping upstream).
    Pure column algebra: one regexp per suffix class, no UDF, no lookup
    join — the table is part of the expression tree.
    """
    h = F.lower(host)
    # longest-first: 2-label public suffix -> keep 3 labels
    two_label = "|".join(s.replace(".", r"\.") for s in PSL_LITE)
    keep3 = F.regexp_extract(h, r"([^.]+\.(?:" + two_label + r"))$", 1)
    keep2 = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return F.when(keep3 != "", keep3).when(keep2 != "", keep2).otherwise(h)


def surt_key(url: Column) -> Column:
    """SURT-form URL key (Sort-friendly URI Reordering Transform — the
    web-archive CDX index key: IIPC OpenWayback/Heritrix convention,
    e.g. ``https://www.Example.org/A/b?z=1&a=2#f`` ->
    ``org,example)/a/b?a=2&z=1``).  Reversed-host keys make every page
    of a site (and of its subdomains) CONTIGUOUS under a range sort —
    the property CDX indexes, per-site frontier scans, and Iceberg
    sort-order clustering all exploit at 100 TB.

    Pinned canonicalization (engine-exact, matching Heritrix's default
    rules for the shapes the engine synthesizes):

    - scheme dropped; everything lowercased;
    - leading ``www.`` stripped from the host; host labels reversed and
      comma-joined, then ``)``;
    - path kept verbatim (empty path -> ``/``); fragment dropped;
    - query params sorted bytewise and re-joined with ``&`` (empty query
      / bare ``?`` drops entirely).

    Pure column algebra — regexps + array reverse/sort, zero shuffle,
    zero Python.
    """
    u = F.lower(url)
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qry = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(F.split(qry, "&"), lambda p: p != ""))
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(rev, F.lit(")"), path, qpart)
