"""Soft-404 detection: pages that return HTTP 200 but are error pages.

Crawl-hygiene operator (public recipe: Bar-Yossef, Broder, Kumar,
Tomkins 2004, "Sic transit gloria telae" — the soft-404 problem; every
production crawler ships a heuristic tier like this).  The reference
trusts HTTP status alone (services/crawler/crawler_service.py fetch
path), so soft-404s enter its corpus as ordinary pages; at training
scale they are boilerplate duplicates that dedup only partially
catches, and the cheap signal tier below removes most of them before
any content hashing runs.

Pinned signals (all engine-portable column algebra):

- ``has_404_pattern``: case-insensitive match of the pinned banner
  alternation ``page not found | 404 error | error 404 |
  does not exist | no longer available | nothing (was) found`` over
  the text
- ``too_short``: fewer than ``min_chars`` characters (error templates
  are short; threshold is the caller's corpus knob)
- ``is_soft404`` = has_404_pattern AND (too_short OR
  ``short_factor``-relaxed length gate) — a banner on a long, real
  page (a search-results page QUOTING "not found") should not be
  flagged, so the verdict requires the banner plus a length signal

Scale shape: pure zero-shuffle codegen'd projection fused with the
scan — one regexp + one length compare per row, no Python, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2/Java-portable alternation, applied to lower(text)
PATTERN = (
    r"(page not found|404 error|error 404|does not exist"
    r"|no longer available|nothing (was )?found)"
)


def soft404_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_chars: int = 200,
    short_factor: int = 2,
) -> DataFrame:
    """(id, n_chars, has_404_pattern, too_short, is_soft404) — verdict =
    banner AND length(text) < min_chars * short_factor (the relaxed gate
    keeps banner-quoting long pages unflagged)."""
    n = F.length(F.col(text_col)).cast("long")
    banner = F.lower(F.col(text_col)).rlike(PATTERN)
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_chars"),
        banner.alias("has_404_pattern"),
        (n < min_chars).alias("too_short"),
        (banner & (n < min_chars * short_factor)).alias("is_soft404"),
    )
