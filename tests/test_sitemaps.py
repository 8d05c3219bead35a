"""Sitemap source (sources/sitemaps.py)."""

from __future__ import annotations

from eget_spark.sources.sitemaps import (
    build_sitemapindex_xml,
    build_urlset_xml,
    expand_sitemap_indexes,
    parse_sitemap_xml,
    parse_sitemaps,
    sitemap_seed_frontier,
)


def test_parse_urlset_fields_and_optionals():
    xml = build_urlset_xml(
        [
            {"loc": "https://a/1", "lastmod": "2024-01-02",
             "changefreq": "daily", "priority": "0.8"},
            {"loc": "https://a/2"},  # optionals absent
        ]
    )
    got = parse_sitemap_xml(xml)
    assert got[0] == {
        "kind": "url", "loc": "https://a/1", "lastmod": "2024-01-02",
        "changefreq": "daily", "priority": 0.8,
    }
    assert got[1]["loc"] == "https://a/2"
    assert got[1]["lastmod"] is None and got[1]["priority"] is None


def test_parse_tolerates_no_namespace_and_garbage():
    bare = "<urlset><url><loc>https://b/1</loc></url></urlset>"
    assert parse_sitemap_xml(bare)[0]["loc"] == "https://b/1"
    assert parse_sitemap_xml("<not xml") == []
    assert parse_sitemap_xml("<urlset><url></url></urlset>") == []  # no loc


def test_parse_sitemapindex():
    xml = build_sitemapindex_xml(["https://a/sm1.xml", "https://a/sm2.xml"])
    got = parse_sitemap_xml(xml)
    assert [e["kind"] for e in got] == ["sitemap", "sitemap"]
    assert [e["loc"] for e in got] == ["https://a/sm1.xml", "https://a/sm2.xml"]


def test_expand_index_tree_and_seed_order(spark):
    # root index -> two urlsets; one loc is shared to prove distinct
    sm_rows = [
        ("https://a/sitemap.xml",
         build_sitemapindex_xml(["https://a/sm1.xml", "https://a/sm2.xml"])),
        ("https://a/sm1.xml", build_urlset_xml(
            [{"loc": "https://a/p1", "priority": "0.9"},
             {"loc": "https://a/p2", "priority": "0.1"}])),
        ("https://a/sm2.xml", build_urlset_xml(
            [{"loc": "https://a/p2", "priority": "0.5"},
             {"loc": "https://a/p3"}])),
        # unreferenced sitemap must NOT contribute
        ("https://a/orphan.xml", build_urlset_xml([{"loc": "https://a/px"}])),
    ]
    sitemaps = spark.createDataFrame(sm_rows, "url string, xml string")
    roots = spark.createDataFrame([("https://a/sitemap.xml",)], "url string")
    pages = expand_sitemap_indexes(sitemaps, roots)
    seeds = sitemap_seed_frontier(pages).collect()
    order = [r["url"] for r in sorted(seeds, key=lambda r: r["seq"])]
    # p1 (0.9) > p2 (max(0.1, 0.5)=0.5) > p3 (no priority -> last)
    assert order == ["https://a/p1", "https://a/p2", "https://a/p3"]


def test_index_cycle_is_bounded(spark):
    sm_rows = [
        ("https://c/a.xml", build_sitemapindex_xml(["https://c/b.xml"])),
        ("https://c/b.xml", build_sitemapindex_xml(["https://c/a.xml"])),
    ]
    sitemaps = spark.createDataFrame(sm_rows, "url string, xml string")
    roots = spark.createDataFrame([("https://c/a.xml",)], "url string")
    pages = expand_sitemap_indexes(sitemaps, roots, max_depth=4)
    assert pages.count() == 0  # terminates, no urls


def test_parse_sitemaps_distributed_matches_local(spark):
    rows = [
        (f"https://h{i}/sitemap.xml", build_urlset_xml(
            [{"loc": f"https://h{i}/p/{j}", "priority": f"0.{j}"}
             for j in range(4)]))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "url string, xml string").repartition(3)
    got = {(r["sitemap_url"], r["loc"], r["priority"])
           for r in parse_sitemaps(df).collect()}
    expect = {(u, e["loc"], e["priority"])
              for u, x in rows for e in parse_sitemap_xml(x)}
    assert got == expect


def test_sitemap_stale_urls_semantics(spark):
    from eget_spark.sources.sitemaps import sitemap_stale_urls
    from pyspark.sql import functions as F

    parsed = spark.createDataFrame(
        [
            ("url", "u1", "2024-02-01"),  # newer than fetch -> stale
            ("url", "u2", "2024-01-01"),  # older -> fresh (absent)
            ("url", "u3", None),          # no lastmod -> never stale
            ("url", "u4", "2024-02-01"),  # never fetched -> new
            ("url", "u5", "2024-01-15"),  # equal to fetch -> fresh (strict >)
            ("sitemap", "idx", "2024-03-01"),  # index rows ignored
        ],
        "kind string, loc string, lastmod string",
    )
    fetched = spark.createDataFrame(
        [("u1", "2024-01-15"), ("u2", "2024-01-15"), ("u3", "2024-01-15"),
         ("u5", "2024-01-15")],
        "url string, fetched_at string",
    ).withColumn("fetched_at", F.col("fetched_at").cast("timestamp"))
    got = {r["url"]: r["reason"] for r in
           sitemap_stale_urls(parsed, fetched).collect()}
    assert got == {"u1": "stale", "u4": "new"}


def test_sitemap_coverage_matches_python(spark):
    from eget_spark.sources.sitemaps import sitemap_coverage

    s = spark.createDataFrame(
        [("h1", "a"), ("h1", "b"), ("h1", "c"), ("h2", "x"),
         ("h1", "a")],  # duplicate listing counts once
        "host string, url string",
    )
    c = spark.createDataFrame(
        [("h1", "a"), ("h1", "z"), ("h3", "q")],
        "host string, url string",
    )
    got = {
        r["host"]: (
            r["n_sitemap"], r["n_crawled"], r["n_both"],
            r["n_uncrawled"], r["n_orphan"], r["coverage_permille"],
        )
        for r in sitemap_coverage(s, c).collect()
    }
    assert got == {
        # h1: 3 listed, 2 crawled, 1 overlap -> coverage 333
        "h1": (3, 2, 1, 2, 1, 333),
        # h2: listed but never crawled
        "h2": (1, 0, 0, 1, 0, 0),
        # h3: crawled with no sitemap -> permille NULL
        "h3": (0, 1, 0, 0, 1, None),
    }


def test_sitemap_shards_roundtrip_and_caps(spark):
    from eget_spark.sources.sitemaps import (
        build_urlset_xml,
        parse_sitemap_xml,
        sitemap_shards,
    )

    rows = [
        (f"https://s.example.org/p/{i:03d}", f"2026-01-{1 + i % 28:02d}")
        for i in range(137)
    ]
    urls = spark.createDataFrame(rows, "loc string, lastmod string")
    shards = sorted(
        sitemap_shards(urls, lastmod_col="lastmod", shard_size=50).collect(),
        key=lambda r: r.shard_id,
    )
    assert [r.shard_id for r in shards] == [0, 1, 2]
    assert [r.n_urls for r in shards] == [50, 50, 37]
    # every shard's XML parses back to exactly its slice, in loc order
    want = sorted(rows)
    got = []
    for r in shards:
        ents = parse_sitemap_xml(r.xml)
        assert all(e["kind"] == "url" for e in ents)
        got += [(e["loc"], e["lastmod"]) for e in ents]
        assert r.first_loc == ents[0]["loc"]
        assert r.last_loc == ents[-1]["loc"]
    assert got == want
    # byte-identical to the fixture writer over the same entries
    ents0 = [
        {"loc": loc, "lastmod": lm} for loc, lm in want[:50]
    ]
    assert shards[0].xml == build_urlset_xml(ents0)


def test_sitemap_shards_escapes_loc(spark):
    from eget_spark.sources.sitemaps import parse_sitemap_xml, sitemap_shards

    urls = spark.createDataFrame(
        [("https://s.example.org/a?x=1&y=<2>", None)],
        "loc string, lastmod string",
    )
    r = sitemap_shards(urls).collect()[0]
    assert "&amp;" in r.xml and "&lt;2&gt;" in r.xml and "&y=<" not in r.xml
    # the parser unescapes back to the original
    assert parse_sitemap_xml(r.xml)[0]["loc"] == "https://s.example.org/a?x=1&y=<2>"
    # lastmod omitted entirely when null
    assert "<lastmod>" not in r.xml


def test_save_sitemap_shards_index(spark, tmp_path):
    from eget_spark.sources.sitemaps import (
        parse_sitemap_xml,
        save_sitemap_shards,
    )

    rows = [(f"https://s.example.org/p/{i:02d}", None) for i in range(23)]
    urls = spark.createDataFrame(rows, "loc string, lastmod string")
    out = str(tmp_path / "maps")
    idx = save_sitemap_shards(
        urls, out, "https://s.example.org/maps", shard_size=10
    )
    ents = parse_sitemap_xml(open(idx).read())
    assert [e["kind"] for e in ents] == ["sitemap"] * 3
    locs = [e["loc"] for e in ents]
    assert locs == [
        f"https://s.example.org/maps/sitemap-{i:05d}.xml" for i in range(3)
    ]
    # the referenced files exist and jointly contain every URL once
    import os

    seen = []
    for i in range(3):
        xml = open(os.path.join(out, f"sitemap-{i:05d}.xml")).read()
        seen += [e["loc"] for e in parse_sitemap_xml(xml)]
    assert sorted(seen) == sorted(r[0] for r in rows)
