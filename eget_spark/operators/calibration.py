"""Classifier-calibration audit: reliability bins + expected calibration
error (ECE).

Web-curation pipelines gate documents on classifier scores (the q150
quality classifier, fastText-style language/quality models in CCNet /
Gopher / FineWeb).  Thresholding those scores is only sound if the score
actually behaves like a probability — a model that says "0.9" should be
right ~90% of the time.  The standard audit is the reliability diagram
and its scalar summary ECE (Naeini, Cooper & Hauskrecht AAAI 2015;
popularized for modern nets by Guo et al. ICML 2017): partition the
score range into M equal-width bins, compare each bin's mean confidence
against its empirical accuracy, and weight the gaps by bin mass:

    ECE = sum_m  (n_m / N) * | acc(m) - conf(m) |

Pinned integer semantics (so the DuckDB oracle is bit-exact):

- scores arrive as int64 ppm in [0, 1_000_000] (parts-per-million
  probability), labels as 0/1 int64
- bin        = ``least(score_ppm * M div 1_000_000, M - 1)`` — the top
  edge (exactly 1.0) folds into the last bin, the usual convention
- acc_ppm    = ``sum(label)  * 1_000_000 div n``   (exact truncating)
- conf_ppm   = ``sum(score_ppm) div n``            (exact truncating)
- gap_ppm    = ``abs(acc_ppm - conf_ppm)``
- ece_ppm    = ``sum_bins(n * gap_ppm) div N`` — replicated onto every
  output row so the result table carries the scalar without a second
  query; all arithmetic is int64, no floats anywhere
- empty bins simply don't appear (they contribute 0 mass to ECE)

Scale shape (100 TB): binning is a pure projection; the per-bin stats
are ONE map-side-combined groupBy on at most M distinct keys (each map
task emits <= M rows regardless of input size — the combine absorbs all
skew by construction); the ECE scalar is an aggregate of that M-row
table riding a 1-row broadcast.  No windows, no joins against the raw
score table, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score_ppm",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins over (score_ppm, label) rows.

    Returns one row per non-empty bin: (bin, n, pos, conf_ppm, acc_ppm,
    gap_ppm, ece_ppm) ordered by bin; ``ece_ppm`` is the corpus-level
    expected calibration error, identical on every row."""
    binned = scored.select(
        F.least(
            F.expr(f"CAST({score_col} AS BIGINT) * {n_bins} DIV {PPM}"),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin"),
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("long").alias("y"),
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
        F.sum("s").cast("long").alias("s_sum"),
    )
    bins = bins.select(
        "bin",
        "n",
        "pos",
        F.expr("s_sum DIV n").alias("conf_ppm"),
        F.expr(f"pos * {PPM} DIV n").alias("acc_ppm"),
    ).withColumn("gap_ppm", F.abs(F.col("acc_ppm") - F.col("conf_ppm")))
    ece = bins.agg(
        F.expr("sum(n * gap_ppm) DIV sum(n)").cast("long").alias("ece_ppm")
    )
    return (
        bins.crossJoin(F.broadcast(ece))
        .select("bin", "n", "pos", "conf_ppm", "acc_ppm", "gap_ppm", "ece_ppm")
        .orderBy("bin")
    )
