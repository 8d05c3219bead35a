"""URL path-prefix rollup: site-structure analytics over crawled URLs.

Every crawl-ops question about a site's shape — "which sections are
biggest", "where do the trap URLs cluster", "what does /products/...
contribute" — is a rollup over PATH PREFIXES: /a/b/c counts toward /a,
/a/b, and /a/b/c (up to a depth cap).  The reference's URL handling
stops at per-URL filters (services/crawler/url_utils, SURVEY §2.2);
the hierarchy rollup is the analytics extension every crawl dashboard
ships.

Scale shape: prefixes are generated INSIDE the row (one transform over
the split segments — at most ``max_depth`` array entries), then ONE
explode + map-side-combined groupBy(host, prefix).  Output cardinality
is the number of distinct directories, not URLs.  No Python, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_of, path_of


def path_prefix_counts(
    pages: DataFrame, url_col: str = "url", max_depth: int = 3
) -> DataFrame:
    """(host, prefix, depth, n_pages) — every URL counts toward each of
    its path prefixes up to ``max_depth`` segments; root-only URLs
    (path "/" or empty) count toward prefix "/" at depth 0."""
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    segs = F.filter(
        F.split(path_of(F.col(url_col)), "/"), lambda s: s != F.lit("")
    )
    depths = F.sequence(F.lit(1), F.least(F.size(segs), F.lit(max_depth)))
    prefixes = F.when(F.size(segs) == 0, F.array(F.lit("/"))).otherwise(
        F.transform(
            depths,
            lambda i: F.concat(
                F.lit("/"), F.array_join(F.slice(segs, 1, i), "/")
            ),
        )
    )
    return (
        pages.select(
            host_of(F.col(url_col)).alias("host"),
            F.explode(prefixes).alias("prefix"),
        )
        .groupBy("host", "prefix")
        .agg(F.count("*").cast("long").alias("n_pages"))
        .select(
            "host",
            "prefix",
            F.when(F.col("prefix") == "/", F.lit(0))
            .otherwise(F.size(F.split(F.col("prefix"), "/")) - 1)
            .cast("int")
            .alias("depth"),
            "n_pages",
        )
    )
