"""Focused-crawl frontier scoring: topic relevance propagated along links.

Training-data-pipeline extension (no single reference operator; the
reference crawls breadth-first — SURVEY.md §2.10): a focused crawl
(Chakrabarti et al. WWW'99 / the Shark-Search family) orders the frontier
by how topical the PARENT pages were, so the crawler tunnels toward a
topic instead of flooding outward.  This module is the batch form: given
the already-fetched pages and the extracted link set, score every
candidate with the decayed relevance of its best inbound parent; the
result feeds ``schedule_round(..., order_cols=[F.desc("priority"),
"seq"])`` exactly like the PageRank/TrustRank signals.

Pinned semantics (integer-only, engine-exact):

- ``rel(page)``  = occurrence count of the topic keywords among the
  page's tokens (lowercased, split on whitespace — the repo-standard
  ``functions.text.tokens`` discipline; occurrences, not distinct hits);
- ``priority(dst)`` = max over inbound edges (src, dst) of
  ``(rel(src) * decay_num) div decay_den`` — int64 floor division, so a
  child is worth ``decay_num/decay_den`` of its most-relevant parent and
  ties/ordering are bit-exact across engines.

Scale shape (100 TB): relevance is a ZERO-shuffle projection (the keyword
probe is one ``array_contains`` filter over the token array — no explode,
no join; keyword lists are lexer-sized, they live in the expression).
Propagation is one edges-vs-rel hash join on ``src`` followed by one
map-side-combined ``max`` aggregate on ``dst`` — the same single-shuffle
shape as one PageRank iteration, AQE splitting any celebrity-page skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def keyword_relevance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
) -> DataFrame:
    """(id, rel): occurrence count of ``keywords`` in each page's tokens."""
    kw = F.array(*[F.lit(k.lower()) for k in keywords])
    toks = tokens(F.lower(F.col(text_col)))
    rel: Column = F.size(F.filter(toks, lambda t: F.array_contains(kw, t)))
    return df.select(
        F.col(id_col).alias("id"), rel.cast("long").alias("rel")
    )


def focused_priorities(
    rel: DataFrame,
    edges: DataFrame,
    decay_num: int = 1,
    decay_den: int = 2,
) -> DataFrame:
    """(dst, priority) over :func:`keyword_relevance` output and an
    (src, dst) edge set — max inbound parent relevance, decayed."""
    num, den = int(decay_num), int(decay_den)
    return (
        edges.join(rel, edges["src"] == rel["id"])
        .groupBy("dst")
        .agg(
            F.max(F.expr(f"(rel * {num}) div {den}"))
            .cast("long")
            .alias("priority")
        )
    )
