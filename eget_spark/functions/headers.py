"""HTTP caching/backoff header algebra (RFC 9111 freshness, RFC 9110
Retry-After) — pure JVM column expressions.

Reference parity: eGet caches fetches and re-uses them within a TTL
(services/cache/cache_service.py get/set with expiry) and backs off on
failures; a production crawler derives both numbers from response
headers instead of a global constant.  These functions pin the derivation
the engine uses (documented subset of the RFCs — the shapes synthetic and
real corpora actually carry):

- ``cache_ttl_seconds``: ``no-store``/``no-cache`` -> 0; else the first
  ``max-age=N`` directive wins; else ``Expires - Date`` clamped at 0;
  else NULL (caller falls back to its default TTL).  Timestamps arrive
  as epoch-second columns — header-date parsing happens at ingest.
- ``retry_after_seconds``: the delta-seconds form of ``Retry-After``
  (digit-only string); the HTTP-date form is normalized upstream.
- ``backoff_ms``: server hint first (Retry-After), else capped binary
  exponential backoff ``min(cap, base << attempt)`` — the classic
  politeness ladder, int64 and branch-free.

Everything here is regexp + arithmetic column algebra: zero shuffle,
zero Python, safe in the hottest per-URL projection at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAX_AGE_RE = r"(?:^|[,\s])max-age=([0-9]+)"


def cache_ttl_seconds(
    cache_control: Column, expires_epoch: Column, date_epoch: Column
) -> Column:
    """Freshness lifetime in seconds (long), NULL when underivable."""
    cc = F.lower(F.coalesce(cache_control, F.lit("")))
    uncacheable = cc.contains("no-store") | cc.contains("no-cache")
    max_age = F.regexp_extract(cc, _MAX_AGE_RE, 1)
    heuristic = F.greatest(
        F.lit(0).cast("long"),
        (expires_epoch.cast("long") - date_epoch.cast("long")),
    )
    return (
        F.when(uncacheable, F.lit(0).cast("long"))
        # try_cast: a hostile >19-digit max-age must degrade to the
        # heuristic/NULL path, not throw under ANSI mode
        .when(
            (max_age != "") & max_age.try_cast("long").isNotNull(),
            max_age.try_cast("long"),
        )
        .when(
            expires_epoch.isNotNull() & date_epoch.isNotNull(), heuristic
        )
        .otherwise(F.lit(None).cast("long"))
    )


def retry_after_seconds(header: Column) -> Column:
    """Delta-seconds ``Retry-After`` (long); NULL for empty/non-numeric
    (and for values past int64 — try_cast, so a hostile 20-digit header
    degrades to NULL instead of throwing under ANSI mode)."""
    h = F.trim(F.coalesce(header, F.lit("")))
    return F.when(h.rlike(r"^[0-9]+$"), h.try_cast("long")).otherwise(
        F.lit(None).cast("long")
    )


def backoff_ms(
    attempt: Column,
    retry_after_s: Column,
    base_ms: int = 500,
    cap_ms: int = 60_000,
) -> Column:
    """Next-fetch delay in ms: server hint else capped exponential."""
    # Clamp the shift at the first exponent where base << a already
    # reaches the cap: min(cap, base << a) is constant = cap beyond it,
    # so the clamp is value-preserving AND kills the int32 shift
    # wraparound (attempt=31 -> negative delay, attempt=32 -> ladder
    # reset) a persistent failer would otherwise hit.
    shift_cap = max(0, (int(cap_ms) // max(int(base_ms), 1)).bit_length())
    # F.shiftleft takes a Python-int bit count; call_function reaches the
    # SQL shiftleft, which accepts a column
    exp = F.least(
        F.lit(int(cap_ms)).cast("long"),
        F.lit(int(base_ms)).cast("long")
        * F.call_function(
            "shiftleft",
            F.lit(1),
            F.least(attempt.cast("int"), F.lit(shift_cap)),
        ).cast("long"),
    )
    return F.coalesce(retry_after_s.cast("long") * 1000, exp)
