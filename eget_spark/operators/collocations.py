"""Corpus collocation mining: PMI and Dunning log-likelihood ratio.

Collocation extraction ranks adjacent word pairs that co-occur far more
often than chance — the classic corpus-linguistics signal (Church &
Hanks 1990 pointwise mutual information; Dunning 1993 log-likelihood
ratio, the test that stays calibrated on the rare-event counts web
corpora are made of; Manning & Schütze ch. 5 is the textbook account).
In a crawl pipeline the top-LLR pairs surface boilerplate phrases,
navigation labels, and template fragments that repeat across a host —
the phrase-level complement to the line- and n-gram-level dedup
operators.

Pinned semantics (so the DuckDB oracle reproduces them exactly):

- tokens = lowercased runs split on ``[^a-z0-9]+``, empties dropped
  (the engine-wide tokenizer pin from operators/lm_score.py)
- events = adjacent bigrams; the 2x2 contingency table for a pair
  (w1, w2) is built from BIGRAM-EVENT margins: ``c1`` = bigrams whose
  first word is w1, ``c2`` = bigrams whose second word is w2, ``t`` =
  total bigrams.  Margins from the bigram table (not raw word counts)
  keep every cell ``k12 = c1 - c12``, ``k21 = c2 - c12``,
  ``k22 = t - c1 - c2 + c12`` a provably non-negative integer.
- ``pmi_micro  = round(1e6 * ln(c12 * t / (c1 * c2)))``
- ``llr_micro  = round(1e6 * 2 * sum over cells k>0 of
  k * ln(k * t / (row * col)))`` (Dunning's G² in micro-nats; cells
  with k = 0 contribute 0)
- pairs with ``c12 < min_count`` are dropped; output is the top-k by
  (llr_micro desc, w1, w2)

Scale shape (100 TB): one explode -> groupBy(w1, w2) count builds the
bigram table with map-side partial combine (a hot template phrase
collapses to one row per map task before the shuffle); the two margins
are groupBys OF THE BIGRAM TABLE (already one row per distinct pair —
orders of magnitude smaller than the token stream); the scalar total
rides a 1-row broadcast cross join; the margin joins key on unique
(w1) / (w2) rows, so nothing replicates.  No driver loops, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eget_spark.operators.lm_score import _bigram_arr


def _llr_term(k, row, col, t):
    """One G² cell: k * ln(k*t/(row*col)), 0 when k = 0."""
    return F.when(
        k > 0, k.cast("double") * F.log(k.cast("double") * t / (row * col))
    ).otherwise(F.lit(0.0))


def collocation_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by Dunning LLR.

    Returns (w1, w2, c12, c1, c2, pmi_micro, llr_micro) ordered by
    (llr_micro desc, w1, w2), limited to k rows.
    """
    bi = (
        df.select(F.explode(_bigram_arr(text_col)).alias("bg"))
        .select(
            F.split("bg", " ").getItem(0).alias("w1"),
            F.split("bg", " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
    )
    left = bi.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    right = bi.groupBy("w2").agg(F.sum("c12").cast("long").alias("c2"))
    tot = bi.agg(F.sum("c12").cast("long").alias("t"))

    j = (
        bi.where(F.col("c12") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
    )
    td = F.col("t").cast("double")
    c1d = F.col("c1").cast("double")
    c2d = F.col("c2").cast("double")
    k11 = F.col("c12")
    k12 = F.col("c1") - F.col("c12")
    k21 = F.col("c2") - F.col("c12")
    k22 = F.col("t") - F.col("c1") - F.col("c2") + F.col("c12")
    r2 = td - c1d
    cc2 = td - c2d
    llr = 2.0 * (
        _llr_term(k11, c1d, c2d, td)
        + _llr_term(k12, c1d, cc2, td)
        + _llr_term(k21, r2, c2d, td)
        + _llr_term(k22, r2, cc2, td)
    )
    pmi = F.log(F.col("c12").cast("double") * td / (c1d * c2d))
    return (
        j.select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(pmi * 1e6).cast("long").alias("pmi_micro"),
            F.round(llr * 1e6).cast("long").alias("llr_micro"),
        )
        .orderBy(F.col("llr_micro").desc(), "w1", "w2")
        .limit(k)
    )
