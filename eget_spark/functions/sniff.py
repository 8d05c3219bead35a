"""Content-type sniffing: magic-byte detection over binary payloads.

A crawl fetches bytes, not declared types — Content-Type headers lie (or
are absent), and the converter router (sources/converters.py) must pick
PDF/OOXML/image/HTML paths from the payload itself.  This is the
standard magic-number sniff (the first bytes of every major container
format are PUBLIC file-format constants; HTML detection follows the
WHATWG MIME-sniffing spirit: case-insensitive ``<!doctype html`` /
``<html`` after leading whitespace).

Everything is JVM-side column algebra — ``substring`` on the binary
column, one ``hex`` of the first 8 bytes, prefix compares — so sniffing
an exabyte of payloads is a zero-shuffle projection inside whole-stage
codegen; no Python touches the bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (hex-prefix of the payload's first bytes, mime type) — longest first so
# more specific magics win (all are mutually exclusive today, but the
# discipline matters when adding e.g. JPEG-2000 next to JPEG)
_MAGICS: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "image/png"),
    ("504B0304", "application/zip"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("FFD8FF", "image/jpeg"),
    ("1F8B", "application/gzip"),
]


def sniff_content_type(payload: Column) -> Column:
    """Binary payload -> mime string.  Magic bytes first, then the HTML
    text probe, else ``application/octet-stream`` (pinned fallback —
    callers wanting a text/plain guess should check UTF-8 validity
    upstream)."""
    hx = F.hex(F.substring(payload, 1, 8))
    expr = F.lit("application/octet-stream")
    # HTML probe: decode a short prefix (invalid bytes become replacement
    # chars, which simply fail the startswith), strip leading whitespace
    # (regexp — ltrim only strips spaces, not \n\t), case-fold
    head = F.lower(
        F.regexp_replace(
            F.decode(F.substring(payload, 1, 64), "UTF-8"), r"^\s+", ""
        )
    )
    expr = F.when(
        head.startswith("<!doctype html") | head.startswith("<html"),
        F.lit("text/html"),
    ).otherwise(expr)
    for hex_prefix, mime in reversed(_MAGICS):
        expr = F.when(hx.startswith(hex_prefix), F.lit(mime)).otherwise(expr)
    return expr
