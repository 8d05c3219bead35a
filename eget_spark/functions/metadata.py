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


def validated_structured_data(spans: Column) -> Column:
    """X10: the reference's fallback shape on validation failure
    (structured_data.py:103-147) — coalesce to the empty struct."""
    m = metadata_map(spans)
    empty = F.create_map(F.lit("language"), F.lit(""))
    return F.struct(
        F.coalesce(open_graph(spans), F.create_map().cast("map<string,string>")).alias("openGraph"),
        F.coalesce(twitter_card(spans), F.create_map().cast("map<string,string>")).alias("twitterCard"),
        F.coalesce(m, empty).alias("metaData"),
    )
