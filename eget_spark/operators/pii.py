"""PII detection and redaction (C4/MassiveText-style scrubbing).

Web-scale training pipelines scrub personally identifiable information
before publishing corpora (the C4 cleanup and most open-web datasets
redact emails/phones/IPs at minimum).  This module detects and redacts
three pattern classes with pure ``regexp_replace``/``regexp_count``
column expressions — zero Python, map-side only, no shuffle at all:

- email addresses          -> ``<EMAIL>``
- international/US phones  -> ``<PHONE>``
- IPv4 addresses           -> ``<IP>``

Exact patterns (pinned so the DuckDB oracle reproduces them; both
engines use RE2-compatible syntax — no backreferences, no lookaround):

- email: ``[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}``
- phone: ``(^|[^0-9])(\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{1,4})?)([^0-9]|$)``
  replaced with ``$1<PHONE>$4`` — BOTH boundaries are *consumed capture
  groups* (start/end of text or one non-digit), not lookaround, because
  DuckDB's RE2 has no lookaround; the groups are restored via
  backreferences so redaction never eats the boundary chars.  The
  leading guard prevents suffix redaction inside longer digit runs
  (``1234-567-8901`` matches nothing); the trailing guard prevents the
  mirror-image PREFIX redaction (``555-123-45678`` matches nothing,
  instead of leaving ``<PHONE>8``).  Adjacent phones separated by a
  single non-digit redact only the first (the separator is consumed) —
  pinned.  The optional tail group picks up a fourth segment
  (extensions, ``+1-555-123-4567``).  Kept simple deliberately: the
  reference point is dataset-scrubbing recall, not RFC validation.
- ipv4: ``\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b`` — Spark's Java regex and
  DuckDB's RE2 both support ``\\b``; octet range is NOT validated (C4
  behavior: over-redaction beats leakage)

Redaction order is email -> ip -> phone so an IP is never half-eaten by
the phone pattern (both match digit runs; order is part of the pinned
contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
# Boundary-guarded on BOTH sides: group 1 consumes start-of-text or one
# non-digit, group 4 consumes end-of-text or one non-digit; both are
# restored by backreferences in the replacement (RE2-safe — no
# lookaround).  Group 2 is the phone body; group 3 an optional 4th
# segment.  The trailing guard is what stops a PREFIX of a longer digit
# run from redacting (e.g. '555-123-45678' must not become '<PHONE>8' —
# the mirror image of the leading-guard case '1234-567-8901').
PHONE_BODY_RE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{1,4})?"
PHONE_RE = r"(^|[^0-9])(" + PHONE_BODY_RE + r")([^0-9]|$)"
PHONE_SUB = "$1<PHONE>$4"  # Java/Spark syntax; DuckDB + Python `re` use \1/\4


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) — counted in redaction order on the
    progressively-redacted text, so overlapping classes are attributed
    the same way the redaction resolves them."""
    after_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("long"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).cast("long"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).cast("long"),
    )


def redact_pii(text: Column) -> Column:
    """Text with all three classes replaced by typed placeholders, in the
    pinned email -> ip -> phone order."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, PHONE_SUB)


def scrub_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, n_emails, n_ips, n_phones, has_pii) — the scrubbed
    corpus plus per-document detection counters.  Entirely map-side
    column expressions: at 100 TB this is a zero-shuffle pass that
    pipelines with whatever scan feeds it."""
    t = F.col(text_col)
    n_email, n_ip, n_phone = pii_counts(t)
    return df.select(
        F.col(id_col).alias("id"),
        redact_pii(t).alias("text"),
        n_email.alias("n_emails"),
        n_ip.alias("n_ips"),
        n_phone.alias("n_phones"),
        ((n_email + n_ip + n_phone) > 0).alias("has_pii"),
    )
