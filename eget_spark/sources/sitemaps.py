"""Sitemap XML source — seed discovery for sitemap-based crawling.

The reference lists "Add support for sitemap-based crawling" on its
roadmap (/root/reference/readme.md:420) but ships no implementation; this
is the engine's version, from the PUBLIC sitemaps.org 0.9 protocol:
``<urlset>`` leaves carry (loc, lastmod, changefreq, priority) page
entries, ``<sitemapindex>`` nodes reference child sitemaps (the 50k-URL /
50 MB per-file caps force big sites into index trees).

Dataflow: sitemaps arrive as (url, xml) rows — the same table shape the
robots source uses; parsing is ONE Arrow `mapInPandas` pass (stdlib
ElementTree, namespace-agnostic).  Index expansion is a bounded
broadcast-join loop (index trees are shallow — depth 2 in practice), and
the resulting seed frontier feeds ``crawl(seed_frontier=...)`` ordered by
(priority desc, loc) — the protocol's own hint order.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITEMAP_XMLNS = "http://www.sitemaps.org/schemas/sitemap/0.9"

PARSED_DDL = (
    "sitemap_url string, kind string, loc string, lastmod string, "
    "changefreq string, priority double"
)


# ---------------------------------------------------------------------------
# writers (synthetic fixtures / tests)
# ---------------------------------------------------------------------------


def build_urlset_xml(entries: list[dict]) -> str:
    """entries: [{loc, lastmod?, changefreq?, priority?}] -> urlset XML."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<urlset xmlns="{SITEMAP_XMLNS}">',
    ]
    for e in entries:
        parts.append("<url>")
        parts.append(f"<loc>{e['loc']}</loc>")
        for k in ("lastmod", "changefreq", "priority"):
            if e.get(k) is not None:
                parts.append(f"<{k}>{e[k]}</{k}>")
        parts.append("</url>")
    parts.append("</urlset>")
    return "".join(parts)


def build_sitemapindex_xml(locs: list[str]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<sitemapindex xmlns="{SITEMAP_XMLNS}">',
    ]
    for loc in locs:
        parts.append(f"<sitemap><loc>{loc}</loc></sitemap>")
    parts.append("</sitemapindex>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_xml(xml: str) -> list[dict]:
    """One sitemap document -> entry dicts.  urlset entries have
    kind='url'; sitemapindex children have kind='sitemap' (loc only).
    Namespace- and case-tolerant; malformed XML yields []."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    root_kind = _local(root.tag)
    out: list[dict] = []
    for child in root:
        tag = _local(child.tag)
        if root_kind == "urlset" and tag == "url":
            kind = "url"
        elif root_kind == "sitemapindex" and tag == "sitemap":
            kind = "sitemap"
        else:
            continue
        fields: dict[str, str] = {}
        for f in child:
            fields[_local(f.tag)] = (f.text or "").strip()
        if not fields.get("loc"):
            continue
        pr = None
        if kind == "url" and fields.get("priority") not in (None, ""):
            try:
                pr = float(fields["priority"])
            except ValueError:
                pr = None
        out.append(
            {
                "kind": kind,
                "loc": fields["loc"],
                "lastmod": fields.get("lastmod"),
                "changefreq": fields.get("changefreq"),
                "priority": pr,
            }
        )
    return out


def parse_sitemaps(
    df: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(url, xml) rows -> one row per sitemap entry.  One Arrow pass, no
    shuffle (documents parse independently)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for u, x in zip(b[url_col], b[xml_col]):
                for e in parse_sitemap_xml(x or ""):
                    rows.append(
                        (u, e["kind"], e["loc"], e["lastmod"],
                         e["changefreq"], e["priority"])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "sitemap_url", "kind", "loc", "lastmod",
                    "changefreq", "priority",
                ],
            )

    return df.mapInPandas(run, PARSED_DDL)


# ---------------------------------------------------------------------------
# index expansion + seeding
# ---------------------------------------------------------------------------


def expand_sitemap_indexes(
    sitemaps: DataFrame,
    roots: DataFrame,
    url_col: str = "url",
    xml_col: str = "xml",
    max_depth: int = 3,
) -> DataFrame:
    """Resolve index trees: start from ``roots`` (url rows), repeatedly
    parse + follow kind='sitemap' locs back into the ``sitemaps`` corpus
    (semi-join on url), accumulating every kind='url' entry.  Bounded by
    ``max_depth`` (protocol trees are depth <= 2; the bound also defuses
    index cycles).  Frontier joins are broadcast — index files are few."""
    frontier = roots.select(F.col(url_col).alias("_u")).distinct()
    seen = frontier
    urls_parts: list[DataFrame] = []
    for _ in range(max_depth):
        batch = sitemaps.join(
            F.broadcast(frontier), sitemaps[url_col] == F.col("_u"), "leftsemi"
        )
        parsed = parse_sitemaps(batch, url_col, xml_col)
        urls_parts.append(parsed.where(F.col("kind") == "url"))
        nxt = (
            parsed.where(F.col("kind") == "sitemap")
            .select(F.col("loc").alias("_u"))
            .distinct()
            .join(F.broadcast(seen), "_u", "left_anti")
        )
        if nxt.isEmpty():
            break
        frontier = nxt
        seen = seen.unionByName(nxt).distinct()
    out = urls_parts[0]
    for p in urls_parts[1:]:
        out = out.unionByName(p)
    return out


def sitemap_seed_frontier(parsed: DataFrame) -> DataFrame:
    """Distinct page URLs ordered by the protocol's own hint:
    (priority desc nulls last, loc) -> (url, seq) for
    ``crawl(seed_frontier=...)``.  Rank via the range-partitioned exact
    sequence, never a single-partition window."""
    from ..operators.sequence import with_global_seq

    pages = (
        parsed.where(F.col("kind") == "url")
        .groupBy("loc")
        .agg(F.max("priority").alias("priority"))
        .withColumn(
            "_nk",
            F.when(F.col("priority").isNull(), F.lit(float("inf"))).otherwise(
                -F.col("priority")
            ),
        )
    )
    res = with_global_seq(pages, ["_nk", "loc"], start=0, seq_col="seq")
    return res.df.select(F.col("loc").alias("url"), "seq")


def sitemap_stale_urls(
    parsed: DataFrame,
    fetched: DataFrame,
    url_col: str = "url",
    fetched_at_col: str = "fetched_at",
) -> DataFrame:
    """Sitemap-lastmod conditional recrawl set — the incremental-crawl
    primitive real crawlers run between full passes: a stored page is
    STALE iff its sitemap ``lastmod`` is strictly newer than its stored
    fetch time; sitemap URLs never fetched are NEW.  Returns
    (url, lastmod, fetched_at, reason in {'new', 'stale'}); fresh pages
    are absent (they cost nothing next round — the whole point).

    Exact semantics (pinned): timestamps compare as timestamps; entries
    without a lastmod are never stale (unknown ≠ newer, the conservative
    sitemaps.org reading).  Scale shape: ONE left join on the url key —
    both sides uniform (a URL appears once per sitemap snapshot and once
    in the store); output feeds plans/crawl.recrawl as the expired set."""
    sm = parsed.where(F.col("kind") == "url").select(
        F.col("loc").alias("url"),
        F.to_timestamp(F.col("lastmod")).alias("lastmod"),
    )
    st = fetched.select(
        F.col(url_col).alias("url"),
        F.col(fetched_at_col).cast("timestamp").alias("fetched_at"),
    )
    j = sm.join(st, "url", "left")
    return j.where(
        F.col("fetched_at").isNull()
        | (F.col("lastmod").isNotNull() & (F.col("lastmod") > F.col("fetched_at")))
    ).select(
        "url",
        "lastmod",
        "fetched_at",
        F.when(F.col("fetched_at").isNull(), F.lit("new"))
        .otherwise(F.lit("stale"))
        .alias("reason"),
    )


def sitemap_coverage(sitemap: DataFrame, crawled: DataFrame) -> DataFrame:
    """Per-host sitemap-vs-crawl coverage audit — the crawl-ops report
    that closes the loop between a site's DECLARED url inventory
    (sitemaps.org urlsets, q80/q133) and what the crawler actually
    fetched: uncrawled sitemap URLs are missed budget, crawled URLs
    absent from the sitemap are orphan/spider-trap suspects.

    Inputs are (host, url) tables (duplicates tolerated — both compact
    to DISTINCT first).  Pinned semantics (integer-only):

    - ``n_sitemap`` / ``n_crawled``: distinct urls per host per side;
    - ``n_both``: urls on both sides;  ``n_uncrawled`` = sitemap-only;
      ``n_orphan`` = crawled-only;
    - ``coverage_permille = (1000 * n_both) div n_sitemap`` (NULL for
      hosts that published no sitemap).

    Hosts appearing on either side report.  Scale shape: two map-side
    distinct compactions, ONE full-outer join on the (host, url) pair
    key (unique per side — nothing replicates), one map-side-combined
    groupBy(host).  Everything downstream of the join is |hosts|-sized.
    """
    s = sitemap.select(
        F.col("host"), F.col("url"), F.lit(1).alias("_s")
    ).distinct()
    c = crawled.select(
        F.col("host"), F.col("url"), F.lit(1).alias("_c")
    ).distinct()
    both = s.join(c, ["host", "url"], "outer")
    agg = both.groupBy("host").agg(
        F.sum(F.coalesce(F.col("_s"), F.lit(0))).cast("long").alias("n_sitemap"),
        F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("long").alias("n_crawled"),
        F.sum(
            F.when(F.col("_s").isNotNull() & F.col("_c").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_both"),
    )
    return agg.select(
        "host",
        "n_sitemap",
        "n_crawled",
        "n_both",
        (F.col("n_sitemap") - F.col("n_both")).cast("long").alias("n_uncrawled"),
        (F.col("n_crawled") - F.col("n_both")).cast("long").alias("n_orphan"),
        F.when(
            F.col("n_sitemap") > 0,
            F.expr("(1000 * n_both) div n_sitemap"),
        ).cast("long").alias("coverage_permille"),
    )


# ---------------------------------------------------------------------------
# sink: distributed sitemap shard generation (the inverse of the parser)
# ---------------------------------------------------------------------------


def _xml_escape_col(c):
    """sitemaps.org §"Sitemap file location" entity escaping for <loc>
    values (&, ', ", >, < — ampersand FIRST so it never double-escapes),
    as JVM replace chains inside codegen."""
    out = F.replace(c, F.lit("&"), F.lit("&amp;"))
    for raw, ent in (("'", "&apos;"), ('"', "&quot;"), (">", "&gt;"), ("<", "&lt;")):
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def sitemap_shards(
    urls: DataFrame,
    url_col: str = "loc",
    lastmod_col: str | None = None,
    shard_size: int = 50000,
) -> DataFrame:
    """Distributed sitemap GENERATION — the sink inverse of
    :func:`parse_sitemaps`, per the PUBLIC sitemaps.org 0.9 protocol: the
    crawl's URL set, sorted by loc, is cut into shards of at most
    ``shard_size`` URLs (the protocol caps a file at 50,000), and each
    shard's complete ``<urlset>`` XML document is assembled INSIDE the
    engine — byte-identical to :func:`build_urlset_xml` over the same
    entries, so ``parse_sitemap_xml(xml)`` round-trips exactly (pinned
    by test).

    Output: (shard_id, n_urls, first_loc, last_loc, xml), one row per
    shard, ordered content within each shard by loc.

    Scale shape: the global loc order is the range-exchange sequencer
    (operators/sequence.with_global_seq — never a single-partition
    window); shard assembly is ONE groupBy(shard_id) whose partitions
    hold at most ``shard_size`` snippet rows (bounded by the protocol
    cap, not by data skew); escaping and snippet construction are JVM
    replace/concat chains in codegen — no Python anywhere."""
    from ..operators.sequence import with_global_seq

    base = urls.select(
        F.col(url_col).cast("string").alias("loc"),
        (
            F.col(lastmod_col).cast("string")
            if lastmod_col is not None
            else F.lit(None).cast("string")
        ).alias("lastmod"),
    )
    ranked = with_global_seq(base, ["loc"], seq_col="_seq").df
    snip = F.concat(
        F.lit("<url><loc>"),
        _xml_escape_col(F.col("loc")),
        F.lit("</loc>"),
        F.when(
            F.col("lastmod").isNotNull(),
            F.concat(
                F.lit("<lastmod>"), F.col("lastmod"), F.lit("</lastmod>")
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    sharded = ranked.select(
        F.floor(F.col("_seq") / shard_size).cast("long").alias("shard_id"),
        "_seq",
        "loc",
        snip.alias("_snip"),
    )
    agg = sharded.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.min("loc").alias("first_loc"),
        F.max("loc").alias("last_loc"),
        F.sort_array(F.collect_list(F.struct("_seq", "_snip"))).alias("_ss"),
    )
    body = F.concat_ws(
        "", F.transform(F.col("_ss"), lambda s: s.getField("_snip"))
    )
    return agg.select(
        "shard_id",
        "n_urls",
        "first_loc",
        "last_loc",
        F.concat(
            F.lit(
                '<?xml version="1.0" encoding="UTF-8"?>'
                f'<urlset xmlns="{SITEMAP_XMLNS}">'
            ),
            body,
            F.lit("</urlset>"),
        ).alias("xml"),
    )


def save_sitemap_shards(
    urls: DataFrame,
    out_dir: str,
    base_url: str,
    url_col: str = "loc",
    lastmod_col: str | None = None,
    shard_size: int = 50000,
) -> str:
    """Materialize :func:`sitemap_shards` to ``sitemap-<id>.xml`` files
    under ``out_dir`` plus a ``sitemapindex.xml`` referencing them as
    ``<base_url>/sitemap-<id>.xml`` — the layout robots.txt's ``Sitemap:``
    line points at.  Shard files are written executor-side (one tiny file
    per shard; needs a shared filesystem on a real cluster, like any
    file sink); the index is one driver-side file over the shard-id list
    (protocol cap: 50,000 index entries — deeper trees are one recursion
    of this function, documented out of scope).  Returns the index path."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    shards = sitemap_shards(urls, url_col, lastmod_col, shard_size)

    def _write(rows):
        for r in rows:
            path = os.path.join(out_dir, f"sitemap-{r['shard_id']:05d}.xml")
            with open(path, "w", encoding="utf-8") as f:
                f.write(r["xml"])

    shards.select("shard_id", "xml").foreachPartition(_write)
    ids = sorted(r[0] for r in shards.select("shard_id").collect())
    index = build_sitemapindex_xml(
        [f"{base_url.rstrip('/')}/sitemap-{i:05d}.xml" for i in ids]
    )
    index_path = os.path.join(out_dir, "sitemapindex.xml")
    with open(index_path, "w", encoding="utf-8") as f:
        f.write(index)
    return index_path
