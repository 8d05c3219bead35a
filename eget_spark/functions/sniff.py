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


def sniff_charset(payload: Column) -> Column:
    """Binary payload -> charset string, the scraper's decode router
    (the reference extracts ``<meta charset>`` into metadata,
    services/scraper/scraper.py:420-423; this adds the byte-level tier
    above it).  Pinned precedence, WHATWG-encoding-sniff spirit:

    1. BOM: EF BB BF -> utf-8; FF FE -> utf-16le; FE FF -> utf-16be
    2. ``<meta charset="X">`` in the first 1024 bytes (quotes optional)
    3. ``<meta http-equiv=... content="...charset=X">`` ditto
    4. XML declaration ``encoding="X"``
    5. pinned default ``utf-8``

    Detected names are lower-cased verbatim (no alias table — callers
    normalize).  Zero-shuffle column algebra like sniff_content_type:
    one hex of 3 bytes + regexp_extracts over an ISO-8859-1-decoded
    1 KiB prefix (every byte decodes, so the probe never errors).
    """
    bom = F.hex(F.substring(payload, 1, 3))
    head = F.lower(F.decode(F.substring(payload, 1, 1024), "ISO-8859-1"))
    meta = F.regexp_extract(
        head, r"""<meta\s+charset\s*=\s*["']?\s*([a-z0-9._-]+)""", 1
    )
    http_equiv = F.regexp_extract(
        head, r"""<meta[^>]*content\s*=\s*["'][^"']*charset=([a-z0-9._-]+)""", 1
    )
    xml_decl = F.regexp_extract(
        head, r"""<\?xml[^>]*encoding\s*=\s*["']([a-z0-9._-]+)["']""", 1
    )
    first = F.coalesce(
        F.nullif(meta, F.lit("")),
        F.nullif(http_equiv, F.lit("")),
        F.nullif(xml_decl, F.lit("")),
        F.lit("utf-8"),
    )
    return (
        F.when(bom.startswith("EFBBBF"), F.lit("utf-8"))
        .when(bom.startswith("FFFE"), F.lit("utf-16le"))
        .when(bom.startswith("FEFF"), F.lit("utf-16be"))
        .otherwise(first)
    )
