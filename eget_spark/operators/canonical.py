"""rel=canonical URL collapse: cluster fetched pages by their declared
canonical target and elect one representative per cluster.

The reference extracts ``canonical_url`` into page metadata
(services/scraper/scraper.py:400-403 — ``soup.find('link', rel=
'canonical')``) but never acts on it; a training pipeline must, because
rel=canonical is the publisher's own duplicate declaration (print views,
tracking-parameter variants, mobile mirrors all point at one target) and
collapsing on it removes duplicates BEFORE any content hashing runs —
the cheapest dedup tier in the stack (metadata-only, no text touched).

Pinned semantics:

- cluster key = normalized canonical target if the page declares one
  (blank/whitespace declarations ignored), else the page's own
  normalized URL (every page lands in exactly one cluster)
- representative = the cluster member whose own normalized URL equals
  the key (the self-canonical target) when fetched; otherwise the
  lexicographically smallest member URL — deterministic under any
  partitioning, no fetch-order dependence
- normalization = functions/urls.normalize_absolute_expr (fragment +
  query stripped), matching the crawl frontier's own key discipline so
  collapse clusters align with seen-set identity

Scale shape: one map-side-combined ``min(struct)`` hash aggregate on the
cluster key elects representatives (the same partial_min discipline as
operators/line_dedup.py), then one equi-join on the key hands every
member its representative — both sides hash-partition on the key, and a
viral canonical target (10^6 members) is an AQE skew-join split, never a
window sort.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import normalize_absolute_expr


def canonical_collapse(
    pages: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical_url",
) -> DataFrame:
    """(url, canonical_url?) -> (url, canonical_key, representative,
    is_representative, cluster_size) under the pinned semantics above."""
    u = normalize_absolute_expr(F.col(url_col))
    declared = F.nullif(F.trim(F.col(canonical_col)), F.lit(""))
    key = F.coalesce(normalize_absolute_expr(declared), u)
    members = pages.select(
        F.col(url_col).alias("url"),
        u.alias("_u"),
        key.alias("canonical_key"),
    )
    # self-canonical targets sort first (rank 0), then lexicographic URL;
    # min(struct) is map-side combined, so hot clusters stay cheap
    reps = members.groupBy("canonical_key").agg(
        F.min(
            F.struct(
                F.when(F.col("_u") == F.col("canonical_key"), 0)
                .otherwise(1)
                .alias("rank"),
                F.col("url").alias("url"),
            )
        )["url"].alias("representative"),
        F.count("*").cast("long").alias("cluster_size"),
    )
    return members.join(reps, "canonical_key").select(
        "url",
        "canonical_key",
        "representative",
        (F.col("url") == F.col("representative")).alias("is_representative"),
        "cluster_size",
    )


def hreflang_clusters(
    links: DataFrame,
    url_col: str = "url",
    alt_col: str = "alt_url",
    lang_col: str = "hreflang",
    max_iter: int = 50,
) -> DataFrame:
    """Language-alternate page clusters from ``<link rel="alternate"
    hreflang=...>`` edges — the i18n companion to rel=canonical collapse
    (canonical_collapse): all hreflang-linked variants of a page form
    ONE cluster, and dedup/budget accounting should treat the cluster as
    one logical document.

    Exact semantics (pinned): cluster = connected component over the
    bidirectionalized edge set (component id = min url string reachable,
    the dedup.connected_components convention; nodes = every url
    appearing on either side of an edge); canonical_url = the MIN
    ``x-default`` target in the cluster when one exists (Google's
    serving-default convention), else the min member url (= the
    component id).  Returns (url, cluster_id, canonical_url).

    Scale shape: label propagation runs on the alternate EDGE set only
    (O(diameter) tiny for language sets); the x-default pick is one
    map-side-combined min per component + a uniform component join."""
    from .dedup import connected_components

    edges = links.select(
        F.col(url_col).alias("id_a"), F.col(alt_col).alias("id_b")
    )
    comps = connected_components(edges, max_iter=max_iter)
    xd = (
        links.where(F.lower(F.col(lang_col)) == "x-default")
        .select(F.col(url_col).alias("id"), F.col(alt_col).alias("xt"))
        .join(comps, "id")
        .groupBy("component")
        .agg(F.min("xt").alias("xdef"))
    )
    return comps.join(xd, "component", "left").select(
        F.col("id").alias("url"),
        F.col("component").alias("cluster_id"),
        F.coalesce(F.col("xdef"), F.col("component")).alias("canonical_url"),
    )
