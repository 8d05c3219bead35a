"""RSS/Atom feed source: writer->parser roundtrips + tolerance cases."""

from __future__ import annotations

from eget_spark.sources.feeds import (
    build_atom_xml,
    build_rss_xml,
    parse_feed_xml,
    parse_feeds,
)


def test_rss_roundtrip():
    items = [
        {"title": "A", "link": "https://x/a", "guid": "g:a",
         "pubDate": "Mon, 01 Jan 2024 00:00:00 GMT"},
        {"title": "B", "link": "https://x/b"},  # no guid -> falls back to link
    ]
    got = parse_feed_xml(build_rss_xml("chan", items))
    assert [e["kind"] for e in got] == ["rss", "rss"]
    assert got[0]["entry_id"] == "g:a"
    assert got[0]["updated"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert got[1]["entry_id"] == "https://x/b"
    assert got[1]["updated"] is None


def test_atom_roundtrip():
    entries = [
        {"title": "E1", "link": "https://y/1", "id": "urn:1",
         "updated": "2024-01-01T00:00:00Z"},
        {"title": "E2", "link": "https://y/2"},
    ]
    got = parse_feed_xml(build_atom_xml("feed", entries))
    assert [e["kind"] for e in got] == ["atom", "atom"]
    assert got[0]["link"] == "https://y/1"  # from the href attribute
    assert got[0]["entry_id"] == "urn:1"
    assert got[1]["entry_id"] == "https://y/2"


def test_malformed_and_linkless():
    assert parse_feed_xml("<rss><channel><item>") == []
    assert parse_feed_xml("not xml at all") == []
    assert parse_feed_xml("<unknown/>") == []
    # an item with neither link nor guid is dropped
    xml = '<rss version="2.0"><channel><item><title>t</title></item></channel></rss>'
    assert parse_feed_xml(xml) == []


def test_parse_feeds_dataframe(spark):
    rss = build_rss_xml("c", [{"title": "A", "link": "https://x/a"}])
    atom = build_atom_xml("f", [{"title": "B", "link": "https://y/b"}])
    df = spark.createDataFrame(
        [("https://x/feed", rss), ("https://y/feed", atom), ("https://z", "")],
        "url string, xml string",
    )
    rows = sorted(parse_feeds(df).collect(), key=lambda r: r["feed_url"])
    assert len(rows) == 2
    assert rows[0]["kind"] == "rss" and rows[0]["link"] == "https://x/a"
    assert rows[1]["kind"] == "atom" and rows[1]["feed_url"] == "https://y/feed"
