"""Luhn-style extractive summarization: significance-density sentence
selection.

Luhn's auto-abstract method (Luhn, IBM Journal 1958 — the founding
extractive summarizer) scores sentences by how densely they pack the
document's SIGNIFICANT words (frequent, non-stopword terms) and keeps
the top few.  For a training-data pipeline this is the cheap "lead
extraction" pass: per-document key sentences for dedup previews, search
snippets, and distillation targets — the sentence-level companion to
q240's TextRank keywords and q165's keyword extraction.

Pinned semantics (simplified significance-density variant of Luhn's
cluster rule, stated as such):

- sentences = ``[.!?]+`` splits of the raw text (the q124 convention),
  whitespace-trimmed via the same regexp in both engines; token-less
  sentences drop
- significant words = doc-level TOKEN_SPLIT terms with count >=
  ``min_freq`` that are not in the pinned q39 stopword list
- sentence score = ``sig_cnt^2 * 1_000_000 DIV n_tok`` (Luhn's
  significant^2-over-span with the span pinned to the whole sentence)
  — exact int64
- keep the ``top_n`` sentences per doc by (score desc, sent_idx), only
  while sig_cnt > 0; output in document order

Scale shape (100 TB): sentence explode + token explode are projections;
the significant-word set is ONE map-side-combined (doc, token) count
filtered by the broadcast-size stoplist; the per-sentence join is
(doc, token)-keyed against that set; the top-n window partitions by
doc.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .keywords import RAKE_STOPWORDS
from .lm_score import TOKEN_SPLIT

SENT_SPLIT = r"[.!?]+"
_TRIM_LEAD = r"^\s+"
_TRIM_TRAIL = r"\s+$"


def luhn_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_freq: int = 2,
    top_n: int = 3,
) -> DataFrame:
    """(id, sent_idx, n_tok, sig_cnt, score_micro, sentence) — the
    ``top_n`` significance-densest sentences per document, in document
    order."""
    sents = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), SENT_SPLIT)).alias(
                "sent_idx", "raw"
            ),
        )
        .withColumn(
            "sentence",
            F.regexp_replace(
                F.regexp_replace(F.col("raw"), _TRIM_LEAD, ""),
                _TRIM_TRAIL,
                "",
            ),
        )
        .withColumn(
            "toks",
            F.filter(
                F.split(F.lower(F.col("sentence")), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            ),
        )
        .where(F.size("toks") > 0)
        .select("id", "sent_idx", "sentence", "toks",
                F.size("toks").cast("long").alias("n_tok"))
    )
    doc_counts = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                    lambda t: t != F.lit(""),
                )
            ).alias("tok"),
        )
        .groupBy("id", "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    significant = doc_counts.where(
        (F.col("cnt") >= min_freq)
        & ~F.col("tok").isin(RAKE_STOPWORDS)
    ).select("id", "tok")
    sig_per_sent = (
        sents.select(
            "id", "sent_idx", F.explode("toks").alias("tok")
        )
        .join(significant, ["id", "tok"])
        .groupBy("id", "sent_idx")
        .agg(F.count("*").cast("long").alias("sig_cnt"))
    )
    scored = (
        sents.join(sig_per_sent, ["id", "sent_idx"])
        .withColumn(
            "score_micro",
            F.expr(
                "sig_cnt * sig_cnt * CAST(1000000 AS BIGINT) DIV n_tok"
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), "sent_idx"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_n)
        .select("id", "sent_idx", "n_tok", "sig_cnt", "score_micro",
                "sentence")
        .orderBy("id", "sent_idx")
    )
