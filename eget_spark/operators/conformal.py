"""Conformal novelty p-values for newly crawled documents.

"Is this new page unlike the corpus?" asked with a finite-sample,
distribution-free guarantee (Vovk, Gammerman & Shafer, "Algorithmic
Learning in a Random World" 2005): given a reference corpus of
nonconformity scores (higher = stranger — char entropy, LM surprisal,
any q11/q42/q66-style score) and a batch of new documents, the
conformal p-value of a new score s is

    p = (1 + |{reference scores >= s}|) / (n_ref + 1)

If the new document is exchangeable with the reference corpus then
P(p <= alpha) <= alpha EXACTLY, whatever the score distribution — so
gating on p <= 5% admits at most 5% false "novel" flags with no
modeling assumptions at all.  The anomaly-gate companion to q116's
parametric rate anomalies and q167's embedding outliers.

Pinned semantics:
- integer scores (caller casts/quantizes); exact rank counts;
  ``p_ppm = (1 + cnt_ge) * 1e6 DIV (n_ref + 1)`` — pure int64;
- ``min_score`` must lower-bound every batch score (caller contract —
  scores below the covered domain would silently read cnt_ge = 0);
  batch scores above every reference score read cnt_ge = 0, the
  minimal (most novel) p, as theory requires.

Scale shape (100 TB): the reference collapses to its DISTINCT-SCORE
table (one map-side-combined groupBy — score-cardinality-bounded, e.g.
<= 1e6 rows for ppm-quantized scores); the >= counts become tiling
intervals via one window over that bounded table, and the batch probes
them through operators/rangejoin.range_lookup (bucketed equi-join — no
inequality join against the corpus, no per-batch scan of the
reference).  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conformal_pvalues(
    reference: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    min_score: int = 0,
    alpha_ppm: int = 50_000,
    bucket_width: int = 64,
) -> DataFrame:
    """(id, score, cnt_ge, p_ppm, novel) per batch row, ordered by id —
    ``novel`` is the alpha-level conformal flag."""
    from eget_spark.operators.rangejoin import range_lookup

    ref = reference.select(
        F.col(score_col).cast("long").alias("s")
    )
    dist = ref.groupBy("s").agg(F.count("*").cast("long").alias("n_s"))
    w = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    intervals = dist.select(
        F.coalesce(
            F.lag("s").over(Window.orderBy("s")) + 1,
            F.lit(int(min_score)).cast("long"),
        ).alias("lo"),
        (F.col("s") + 1).alias("hi"),
        (
            F.sum("n_s").over(w_all)
            - (F.sum("n_s").over(w) - F.col("n_s"))
        ).cast("long").alias("cnt_ge_v"),
        F.sum("n_s").over(w_all).cast("long").alias("n_ref"),
    ).localCheckpoint()
    points = batch.select(
        F.col(id_col).alias("id"),
        F.col(score_col).cast("long").alias("score"),
    )
    joined = range_lookup(
        points,
        intervals,
        "id",
        "score",
        "lo",
        "hi",
        ["cnt_ge_v", "n_ref"],
        bucket_width=bucket_width,
    )
    n_ref_lit = intervals.select(F.max("n_ref")).collect()[0][0] or 0
    return joined.select(
        "id",
        F.col("score"),
        F.coalesce(F.col("cnt_ge_v"), F.lit(0).cast("long")).alias(
            "cnt_ge"
        ),
    ).select(
        "id",
        "score",
        "cnt_ge",
        F.expr(
            f"(1 + cnt_ge) * CAST(1000000 AS BIGINT)"
            f" DIV ({int(n_ref_lit)} + 1)"
        ).alias("p_ppm"),
    ).select(
        "*",
        (F.col("p_ppm") <= int(alpha_ppm)).alias("novel"),
    ).orderBy("id")
