"""Redirect-chain resolution by pointer doubling.

Crawl-frontier hygiene op: real frontiers are full of 301/302/canonical
chains (http->https, slash, tracking-param strips, shorteners), and the
seen-set / dedup layers must key on the FINAL url, not the hop.  The
reference follows redirects implicitly inside its fetcher (one URL at a
time); at 10^10 URLs the redirect map is itself a table, and resolving
every chain is a graph problem.

Semantics (pinned): follow at most ``max_hops`` redirects; a URL whose
walk reaches a terminal node (one with no outgoing redirect) within the
budget is ``resolved`` with its true hop count; anything still mid-chain
after ``max_hops`` steps — longer chains AND redirect cycles — is
unresolved with ``hops = max_hops``.

Scale shape: POINTER DOUBLING, not step-by-step walking — log2(max_hops)
self-joins of a total step table instead of max_hops joins of the edge
list.  Each round squares the reach: round k maps every node to its
2^k-th successor with the accumulated hop count (terminal nodes are
fixed points contributing 0 hops, so composition is exact past the end
of a chain).  Joins are plain hash joins on the node id; each round is
localCheckpoint-ed so lineage stays O(log max_hops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    universe: DataFrame,
    redirects: DataFrame,
    max_hops: int = 8,
) -> DataFrame:
    """Resolve every id in ``universe`` (column ``id``) through the
    ``redirects`` map (columns ``src``, ``dst``; at most one row per src).

    ``max_hops`` must be a power of two.  Returns
    (id, final_id, hops, resolved).
    """
    if max_hops & (max_hops - 1):
        raise ValueError("max_hops must be a power of two")
    # total step function over the FULL node set (universe ∪ redirect
    # srcs ∪ redirect dsts): terminal nodes map to themselves with 0
    # hops.  Restricting the table to universe ids would make the
    # doubling join silently DROP any chain that passes through a node
    # outside the universe (a.y would find no b.x row); the output is
    # filtered back to the universe at the end.
    nodes = (
        universe.select("id")
        .unionByName(redirects.select(F.col("src").alias("id")))
        .unionByName(redirects.select(F.col("dst").alias("id")))
        .distinct()
    )
    cur = (
        nodes.join(redirects, nodes["id"] == redirects["src"], "left")
        .select(
            F.col("id").alias("x"),
            F.coalesce(F.col("dst"), F.col("id")).alias("y"),
            F.when(F.col("dst").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("hops"),
        )
        .localCheckpoint()
    )
    k = 1
    while k < max_hops:
        a, b = cur.alias("a"), cur.alias("b")
        cur = (
            a.join(b, F.col("a.y") == F.col("b.x"))
            .select(
                F.col("a.x").alias("x"),
                F.col("b.y").alias("y"),
                (F.col("a.hops") + F.col("b.hops")).alias("hops"),
            )
            .localCheckpoint()
        )
        k *= 2
    term = redirects.select(F.col("src").alias("_t")).distinct()
    return (
        cur.join(universe.select(F.col("id").alias("x")), "x", "left_semi")
        .join(term, cur["y"] == F.col("_t"), "left")
        .select(
            F.col("x").alias("id"),
            F.col("y").alias("final_id"),
            "hops",
            F.col("_t").isNull().alias("resolved"),
        )
    )
