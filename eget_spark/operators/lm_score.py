"""Corpus-trained unigram language-model document scoring.

CCNet (Wenzek et al. 2020, public paper) ranks web documents by the
perplexity of a language model trained on clean text and drops the worst
tail — the standard "does this read like language at all" filter in
web-scale training-data pipelines.  A full KenLM is out of scope for a
pure-Spark engine, but the unigram reduction is exactly expressible as
dataflow and already separates gibberish/boilerplate from prose: train a
unigram LM on the corpus itself (or any reference corpus), then score
every document by its mean token log-probability.

Pinned semantics (so the DuckDB oracle reproduces them bit-for-bit):

- tokens    = lowercased runs split on ``[^a-z0-9]+`` (after ``lower``),
  empty tokens dropped
- LM        = add-one-smoothed unigram model over the TRAINING corpus:
  ``logprob(t) = ln((count(t) + 1) / (N + V))`` where N = total token
  occurrences and V = distinct tokens; unseen tokens score
  ``ln(1 / (N + V))``
- doc score = ``round(sum(logprob(t) * k_t) / n_tokens, 6)`` over the
  document's tokens (k_t = in-doc count); docs with no tokens get NULL
  score and ``n_tokens = 0``

Scale shape (100 TB): training is one explode -> groupBy(token) count —
a map-side-combined HashAggregate on a uniform-ish key (Zipf skew on
"the" is absorbed by the partial combine: each map task emits ONE row
per hot token).  Scoring first reduces each doc to its distinct (id,
token, k) rows (same partial-combine argument), then hash-joins that
against the vocabulary on token.  The vocab-side key is unique, so the
join replicates nothing; residual shuffle skew on hot tokens is bounded
by the distinct-doc count and split by AQE skew-join.  The N/V scalars
ride a 1-row broadcast cross join (the pagerank dangling-mass shape) —
no driver round-trip, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def _tok_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok, k): per-document distinct tokens with in-doc counts."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    return toks.groupBy("id", "tok").agg(F.count("*").cast("long").alias("k"))


def unigram_lm(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Train the add-one-smoothed unigram LM: (tok, cnt, logprob).

    Also carries the model scalars (n_total, v_size) on every row so a
    scorer joining this table needs no second aggregate."""
    counts = (
        _tok_rows(df, id_col, text_col)
        .groupBy("tok")
        .agg(F.sum("k").cast("long").alias("cnt"))
    )
    scalars = counts.agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("v_size"),
    )
    return counts.crossJoin(F.broadcast(scalars)).withColumn(
        "logprob",
        F.log((F.col("cnt") + 1) / (F.col("n_total") + F.col("v_size"))),
    )


def unigram_doc_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, lm_score) per document.

    ``lm`` defaults to a model trained on ``df`` itself (self-scoring —
    the CCNet setup scores against a clean reference corpus; pass its
    :func:`unigram_lm` table for that).  ``lm_score`` is the mean token
    log-probability (natural log; higher = more like the training
    corpus); NULL for token-less documents."""
    if lm is None:
        lm = unigram_lm(df, id_col, text_col)
    doc_toks = _tok_rows(df, id_col, text_col)
    # unseen tokens (only possible with an external lm) fall to the
    # smoothing floor ln(1/(N+V)); the scalars ride a 1-row broadcast of
    # their own — the left join nulls the lm columns for unseen tokens,
    # so the floor cannot be computed from the joined row
    scalars = lm.agg(
        F.max("n_total").alias("n_total"), F.max("v_size").alias("v_size")
    )
    floor = F.log(1 / (F.col("n_total") + F.col("v_size")))
    scored = (
        doc_toks.join(lm.select("tok", "logprob"), "tok", "left")
        .crossJoin(F.broadcast(scalars))
        .withColumn("lp", F.coalesce(F.col("logprob"), floor))
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("lp") * F.col("k")) / F.sum("k"), 6).alias(
                "lm_score"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "lm_score",
        )
    )
