"""N-gram novelty scoring: how much unseen text each document contributes.

Training-data-pipeline extension: after near-dup removal a corpus still
contains heavy *partial* repetition (syndicated feeds, templated product
pages, quote-heavy posts).  Data-curriculum and value-of-data work orders
documents by marginal novelty — the fraction of a document's n-grams that
no EARLIER document already contributed (the same first-occurrence-wins
discipline as cross-corpus line dedup, lifted from lines to word
n-grams).  Low-novelty docs are cut or downsampled before training.

Pinned semantics (engine-exact, integer-only):

- grams = the repo-standard word-trigram shingles over lowercased
  whitespace tokens (``functions.text.shingles`` — a doc with < n tokens
  contributes its whole token string as one gram), counted DISTINCT per
  doc;
- a gram is NOVEL in the doc with the smallest id containing it (total
  order on the pinned id column — crawl order, so "earlier" is
  well-defined);
- ``novelty_permille = (1000 * n_novel) div n_grams`` — int64 floor
  division; every doc appears in the output.  Under the pinned shingle
  semantics every doc yields >= 1 gram (a doc with < n tokens — even an
  empty one — contributes its whole token string), so the first empty
  doc is fully novel and later empty docs score 0, exactly like any
  other repeated content.

Scale shape (100 TB): one explode to DISTINCT (id, gram) rows — the
map-side-combined distinct aggregate bounds hot grams to one row per
partition; the first-seen table is ONE ``min(id)`` aggregate on gram
(same shape as line_dedup's winner pick — no window over the corpus);
the join back is gram-keyed with the unique-key side on the aggregate,
so nothing replicates.  Counting novel grams per doc map-side-combines.
No driver collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingle_rows


def doc_grams(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """DISTINCT (id, gram) rows under the pinned shingle semantics —
    the shared unit of batch :func:`ngram_novelty` and the streaming
    incremental maintainer (streaming/novelty.py)."""
    return (
        shingle_rows(df, id_col, text_col, k=n)
        .select("id", F.col("s").alias("gram"))
        .distinct()
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, n_novel, novelty_permille) per document."""
    grams = doc_grams(df, id_col, text_col, n)
    first = grams.groupBy("gram").agg(F.min("id").alias("first_id"))
    scored = (
        grams.join(first, "gram")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("id") == F.col("first_id"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                F.expr("(1000 * n_novel) div n_grams"),
            )
            .otherwise(F.lit(1000))
            .cast("long")
            .alias("novelty_permille"),
        )
    )
