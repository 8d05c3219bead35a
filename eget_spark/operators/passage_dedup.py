"""Duplicated-passage removal (ExactSubstr-style, token n-gram form).

Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better" (public paper), remove repeated substrings at corpus scale: any
passage that also occurs elsewhere keeps its first occurrence and loses
the rest.  The paper's single-machine recipe is a suffix array over the
concatenated corpus; the standard distributed re-expression (used by the
open-web pipelines that followed) is token n-gram cover marking, which
this module pins exactly so a SQL oracle can reproduce it:

- tokens = ``\\s+`` split of the trimmed text, empties dropped (the same
  tokenization contract as operators/decontaminate.py and the q53 oracle)
- documents are globally ordered by ``order_col`` (default: the id);
  n-gram occurrences order lexicographically by (ord, id, pos)
- an occurrence is a DUPLICATE iff an earlier occurrence of the same
  n-gram exists anywhere in the corpus (including the same document)
- a token is removed iff at least one duplicate occurrence covers it
  (pos <= idx < pos + n); kept tokens rejoin with single spaces
- documents shorter than n tokens are never touched

The reference crawler has no corpus-level dedup at all (its
``dedupe_content`` is a per-batch exact content hash —
services/crawler/crawler_service.py); this is the training-pipeline
extension the brief asks for, alongside line_dedup (CCNet) and the
document-level MinHash/SimHash family.

Scale shape (100 TB): the first-occurrence winner per distinct n-gram is
``groupBy(gram).agg(min(struct(ord,id,pos)), count)`` — a HashAggregate
with map-side partial combine, so a boilerplate passage occurring 10^8
times collapses to one row per map task before the shuffle.  Only grams
with count >= 2 are joined back (the overwhelming singleton majority —
random text is mostly unique 50-grams — never re-shuffles; same hot-key
medicine as line_dedup).  The join key is the gram text; a pathological
mega-gram is an AQE skew-join split (and n-gram keys can be swapped for
128-bit hashes without changing semantics — collision probability at
10^12 grams is ~1e-13).  Token-cover marking happens inside the document
row with higher-order functions (filter/exists over the per-doc sorted
duplicate-position array) — no per-token shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(col):
    return F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != F.lit(""))


def dedup_passages(
    df: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    order_col: str | None = None,
) -> DataFrame:
    """(id, text, n_tokens, n_removed) with every non-first occurrence of
    a duplicated token n-gram cut out of the text (module docstring pins
    the exact semantics).  ``order_col`` must be unique per document when
    given; by default the id itself orders documents."""
    ord_expr = F.col(order_col) if order_col else F.col(id_col)
    toks = df.select(
        F.col(id_col).alias("id"),
        ord_expr.alias("ord"),
        _tokens(F.col(text_col)).alias("toks"),
    )
    grams = (
        toks.where(F.size("toks") >= n)
        .select(
            "id",
            "ord",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - n),
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
                )
            ).alias("pos", "gram"),
        )
    )
    # winner (= global first occurrence) and multiplicity per distinct
    # gram, map-side combined; singletons (count 1) are dropped HERE so
    # they never join back — only genuinely duplicated grams re-shuffle
    winners = (
        grams.groupBy("gram")
        .agg(F.min(F.struct("ord", "id", "pos")).alias("w"), F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("gram", "w")
    )
    dup_pos = (
        grams.join(winners, "gram")
        .where(F.struct("ord", "id", "pos") != F.col("w"))
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("pos")).alias("dups"))
    )
    kept = F.when(
        F.col("dups").isNull(), F.col("toks")
    ).otherwise(
        F.filter(
            "toks",
            lambda x, i: ~F.exists(
                "dups", lambda p: (p <= i) & (i < p + F.lit(n))
            ),
        )
    )
    return (
        toks.join(dup_pos, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.concat_ws(" ", kept).alias(text_col),
            F.size("toks").cast("long").alias("n_tokens"),
            (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
        )
    )
