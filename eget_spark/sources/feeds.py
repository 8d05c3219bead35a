"""RSS 2.0 / Atom 1.0 feed source — incremental seed discovery.

Feeds are the standing "what changed on this site" channel a recrawl
scheduler subscribes to (the cheap complement to sitemap diffing: a feed
is small, ordered newest-first, and updated the moment content posts).
The reference's roadmap stops at sitemaps (/root/reference/readme.md:420);
this source adds the other standard discovery format, from the PUBLIC
specs: RSS 2.0 (``<rss><channel><item>``, RSS Advisory Board spec) and
Atom 1.0 (``<feed><entry>``, RFC 4287).

Dataflow mirrors sources/sitemaps.py: feeds arrive as (url, xml) rows and
parse in ONE Arrow ``mapInPandas`` pass (stdlib ElementTree,
namespace/case-tolerant, malformed XML yields no rows).  Each entry row
carries (feed kind, title, link, entry_id, updated) — entry_id is RSS
``<guid>`` / Atom ``<id>`` (falling back to the link), the key the
recrawl layer dedups against its seen set.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame

PARSED_DDL = (
    "feed_url string, kind string, title string, link string, "
    "entry_id string, updated string"
)


# ---------------------------------------------------------------------------
# writers (synthetic fixtures / tests)
# ---------------------------------------------------------------------------


def build_rss_xml(title: str, items: list[dict]) -> str:
    """items: [{title, link, guid?, pubDate?}] -> RSS 2.0 XML."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<rss version="2.0"><channel>',
        f"<title>{title}</title>",
    ]
    for it in items:
        parts.append("<item>")
        for k in ("title", "link", "guid", "pubDate"):
            if it.get(k) is not None:
                parts.append(f"<{k}>{it[k]}</{k}>")
        parts.append("</item>")
    parts.append("</channel></rss>")
    return "".join(parts)


def build_atom_xml(title: str, entries: list[dict]) -> str:
    """entries: [{title, link, id?, updated?}] -> Atom 1.0 XML."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<feed xmlns="http://www.w3.org/2005/Atom">',
        f"<title>{title}</title>",
    ]
    for e in entries:
        parts.append("<entry>")
        if e.get("title") is not None:
            parts.append(f"<title>{e['title']}</title>")
        if e.get("link") is not None:
            parts.append(f'<link href="{e["link"]}"/>')
        for k in ("id", "updated"):
            if e.get(k) is not None:
                parts.append(f"<{k}>{e[k]}</{k}>")
        parts.append("</entry>")
    parts.append("</feed>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _local(tag) -> str:
    return str(tag).rsplit("}", 1)[-1].lower()


def _entry_fields(node, kind: str) -> dict | None:
    title = link = entry_id = updated = None
    for f in node:
        t = _local(f.tag)
        txt = (f.text or "").strip()
        if t == "title":
            title = txt
        elif t == "link":
            # Atom: href attribute; RSS: element text
            link = f.get("href") if kind == "atom" else txt
        elif kind == "rss" and t == "guid":
            entry_id = txt
        elif kind == "atom" and t == "id":
            entry_id = txt
        elif (kind == "rss" and t == "pubdate") or (
            kind == "atom" and t == "updated"
        ):
            updated = txt
    if not link and not entry_id:
        return None
    return {
        "title": title,
        "link": link,
        "entry_id": entry_id or link,
        "updated": updated,
    }


def parse_feed_xml(xml: str) -> list[dict]:
    """One feed document -> entry dicts with kind in {'rss', 'atom'}.
    Unknown root tags and malformed XML yield []."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    rk = _local(root.tag)
    out: list[dict] = []
    if rk == "rss":
        for channel in root:
            if _local(channel.tag) != "channel":
                continue
            for item in channel:
                if _local(item.tag) != "item":
                    continue
                e = _entry_fields(item, "rss")
                if e:
                    out.append({"kind": "rss", **e})
    elif rk == "feed":
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            e = _entry_fields(entry, "atom")
            if e:
                out.append({"kind": "atom", **e})
    return out


def parse_feeds(
    df: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(url, xml) rows -> one row per feed entry.  One Arrow pass, no
    shuffle (documents parse independently)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for u, x in zip(b[url_col], b[xml_col]):
                for e in parse_feed_xml(x or ""):
                    rows.append(
                        (u, e["kind"], e["title"], e["link"],
                         e["entry_id"], e["updated"])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "feed_url", "kind", "title", "link", "entry_id", "updated",
                ],
            )

    return df.mapInPandas(run, PARSED_DDL)
