"""Structured-data / metadata extraction (X4, X8, X9, X10).

The reference extracts ~25 metadata fields and og:/twitter: maps from HTML
(services/scraper/scraper.py:354-483, services/extractors/
structured_data.py:40-147). In the span corpus, page metadata lives in
``metadata`` spans holding a JSON object (FIXTURES.md §1) — extraction is
therefore pure JVM SQL: filter spans -> from_json -> map splits. The
HTML-side variant (BeautifulSoup over raw pages) belongs to the fetch
adapter, out of the engine data plane (SURVEY.md §7.4 no-network rule).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def metadata_json(spans: Column) -> Column:
    """First `metadata` span's JSON text (X8 analogue)."""
    metas = F.filter(spans, lambda s: s["kind"] == F.lit("metadata"))
    return F.when(F.size(metas) > 0, metas[0]["text"])


def metadata_map(spans: Column) -> Column:
    """X4: metadata as map<string,string>."""
    return F.from_json(metadata_json(spans), "map<string,string>")


def open_graph(spans: Column) -> Column:
    """X9: og:* submap (keys with the `og:` prefix stripped is the
    reference's rename step; kept as-is keys here, filtered)."""
    m = metadata_map(spans)
    return F.map_filter(m, lambda k, v: k.startswith("og:"))


def twitter_card(spans: Column) -> Column:
    m = metadata_map(spans)
    return F.map_filter(m, lambda k, v: k.startswith("twitter:"))


def language_of(spans: Column) -> Column:
    """X9 language fallback chain (structured_data.py:11-38):
    lang -> og:locale -> ''."""
    m = metadata_map(spans)
    return F.coalesce(m["lang"], m["og:locale"], F.lit(""))


def title_of(spans: Column) -> Column:
    m = metadata_map(spans)
    return F.coalesce(m["title"], m["og:title"], F.lit(None))


def json_ld_of(spans: Column) -> Column:
    """X8: raw JSON-LD strings — spans of kind `jsonld` (the span-model
    analogue of the <script type="application/ld+json"> harvest,
    structured_data.py:40-53; HTML side: html.extract_json_ld)."""
    return F.transform(
        F.filter(spans, lambda s: s["kind"] == F.lit("jsonld")),
        lambda s: s["text"],
    )


def validated_structured_data(spans: Column) -> Column:
    """X10: full StructuredData shape incl. jsonLd (models/response.py:15-19);
    the reference's fallback on validation failure (structured_data.py:
    103-147) — coalesce each field to its empty value."""
    m = metadata_map(spans)
    empty = F.create_map(F.lit("language"), F.lit(""))
    return F.struct(
        F.coalesce(
            json_ld_of(spans), F.array().cast("array<string>")
        ).alias("jsonLd"),
        F.coalesce(open_graph(spans), F.create_map().cast("map<string,string>")).alias("openGraph"),
        F.coalesce(twitter_card(spans), F.create_map().cast("map<string,string>")).alias("twitterCard"),
        F.coalesce(m, empty).alias("metaData"),
    )


# X4 og:* rename pairs (scraper.py:373-390) — JVM-side mirror of
# html._OG_RENAME for the span-corpus metadata path.
_OG_RENAMES = [
    ("og:title", "ogTitle"),
    ("og:description", "ogDescription"),
    ("og:image", "ogImage"),
    ("og:url", "ogUrl"),
    ("og:site_name", "ogSiteName"),
    ("og:type", "og:type"),
    ("og:locale", "ogLocale"),
]


def metadata_renamed_map(spans: Column) -> Column:
    """X4 rename map over the span-corpus raw metadata keys: og:* keys get
    the reference's camelCase renames (unknown og:x -> 'og' + capitalize),
    `lang` becomes `language`, everything else passes through.  Pure JVM
    (transform_keys) — zero Python."""
    m = metadata_map(spans)

    def rename(k: Column, v: Column) -> Column:
        out = F.when(k == F.lit("lang"), F.lit("language"))
        for raw, renamed in _OG_RENAMES:
            out = out.when(k == F.lit(raw), F.lit(renamed))
        tail = F.substring_index(k, "og:", -1)
        generic = F.concat(
            F.lit("og"), F.upper(F.substring(tail, 1, 1)), F.lower(F.substring(tail, 2, 100000))
        )
        return out.when(k.startswith("og:"), generic).otherwise(k)

    return F.transform_keys(m, rename)


def robots_directives(html, header=None):
    """(noindex, nofollow) boolean columns from a page's robots meta tag
    plus an optional X-Robots-Tag header value — the indexing-consent
    gate real crawlers apply AFTER fetch (RFC 9309 governs fetching;
    meta robots / X-Robots-Tag govern storing and link expansion).

    Exact semantics (pinned for the SQL oracle): the FIRST robots meta
    tag is matched across the four common syntactic forms —
    name-before-content and content-before-name, double- OR
    single-quoted, other attributes allowed between (a consent gate must
    not fail open on ordinary HTML variation); form precedence when a
    page mixes them: name-first-double, name-first-single,
    content-first-double, content-first-single.  The tag content unions
    with the header value; directives split on commas/whitespace;
    ``none`` implies both noindex and nofollow.  Pure regexp column
    algebra — zero shuffle, zero Python."""
    from pyspark.sql import functions as F

    forms = [
        r'(?i)<meta\s[^>]*name\s*=\s*"robots"[^>]*content\s*=\s*"([^"]*)"',
        r"(?i)<meta\s[^>]*name\s*=\s*'robots'[^>]*content\s*=\s*'([^']*)'",
        r'(?i)<meta\s[^>]*content\s*=\s*"([^"]*)"[^>]*name\s*=\s*"robots"',
        r"(?i)<meta\s[^>]*content\s*=\s*'([^']*)'[^>]*name\s*=\s*'robots'",
    ]
    content = F.lower(
        F.coalesce(
            *[F.nullif(F.regexp_extract(html, f, 1), F.lit("")) for f in forms],
            F.lit(""),
        )
    )
    combined = F.concat_ws(
        ",", content, F.lower(F.coalesce(header, F.lit("")) if header is not None else F.lit(""))
    )
    toks = F.split(combined, r"[,\s]+")
    noindex = F.arrays_overlap(toks, F.array(F.lit("noindex"), F.lit("none")))
    nofollow = F.arrays_overlap(toks, F.array(F.lit("nofollow"), F.lit("none")))
    return noindex, nofollow
