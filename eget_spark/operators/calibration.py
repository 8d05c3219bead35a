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


def isotonic_fit(
    scored: DataFrame,
    score_col: str = "score_ppm",
    label_col: str = "label",
    n_bins: int = 20,
) -> DataFrame:
    """Isotonic (PAV) recalibration of binned classifier scores — the
    FIX to :func:`calibration_bins`' audit: the monotone-nondecreasing
    probability curve closest (L2) to the empirical bin accuracies
    (Ayer et al. AoMS 1955; Zadrozny & Elkan KDD 2002 for classifier
    calibration).  Computed by the exact MIN-MAX closed form (Ayer's
    theorem — provably equal to the pool-adjacent-violators sweep):

        fit_i = max_{j<=i} min_{k>=i} (P_k - P_{j-1}) / (N_k - N_{j-1})

    over cumulative bin masses, which is pure dataflow — no sequential
    pooling loop anywhere.

    Pinned semantics: bins and counts exactly as calibration_bins
    (ppm scores, top-edge fold, empty bins absent — PAV runs over the
    PRESENT bins in score order); the (j,k) averages are single IEEE
    divisions of exact int64 cumulative counts, min/max over doubles
    are order-free, and fit_ppm = round(1e6 * fit).

    Scale shape (100 TB): the corpus collapses to the <= M-row bin
    table via ONE map-side-combined groupBy (M keys bound every map
    task's output); the min-max expansion is the M^3 triple join of
    that broadcast-class table (M=20 -> 8000 rows) — corpus size never
    appears after the first aggregate.  The cumulative window runs over
    the M-row table only.  Output per bin:
    (bin, n, pos, raw_ppm, fit_ppm), fit monotone by construction."""
    from pyspark.sql import Window

    binned = scored.select(
        F.least(
            F.expr(f"CAST({score_col} AS BIGINT) * {n_bins} DIV {PPM}"),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin"),
        F.col(label_col).cast("long").alias("y"),
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(w).cast("long").alias("n_cum"),
        F.sum("pos").over(w).cast("long").alias("p_cum"),
    ).localCheckpoint()
    j_side = cum.select(
        F.col("bin").alias("bin_j"),
        (F.col("n_cum") - F.col("n")).alias("n_excl"),
        (F.col("p_cum") - F.col("pos")).alias("p_excl"),
    )
    k_side = cum.select(
        F.col("bin").alias("bin_k"),
        F.col("n_cum").alias("n_incl"),
        F.col("p_cum").alias("p_incl"),
    )
    i_side = cum.select(F.col("bin").alias("bin_i"))
    pairs = j_side.join(
        F.broadcast(k_side), F.col("bin_j") <= F.col("bin_k")
    ).select(
        "bin_j",
        "bin_k",
        (
            (F.col("p_incl") - F.col("p_excl")).cast("double")
            / (F.col("n_incl") - F.col("n_excl")).cast("double")
        ).alias("avg"),
    )
    triple = pairs.join(
        F.broadcast(i_side),
        (F.col("bin_j") <= F.col("bin_i"))
        & (F.col("bin_i") <= F.col("bin_k")),
    )
    inner = triple.groupBy("bin_i", "bin_j").agg(
        F.min("avg").alias("m")
    )
    fit = inner.groupBy("bin_i").agg(F.max("m").alias("fit"))
    return (
        cum.join(fit, cum["bin"] == fit["bin_i"])
        .select(
            "bin",
            "n",
            "pos",
            F.expr(f"pos * {PPM} DIV n").alias("raw_ppm"),
            F.expr("CAST(round(1e6 * fit) AS BIGINT)").alias("fit_ppm"),
        )
        .orderBy("bin")
    )


def brier_decomposition(
    scored: DataFrame,
    score_col: str = "score_ppm",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score over forecast
    bins: BRIER = RELIABILITY - RESOLUTION + UNCERTAINTY (+ a
    within-bin variance residual, emitted rather than hidden — the
    identity is exact only when forecasts are constant within a bin).
    Reliability is what :func:`calibration_bins` gaps measure, squared
    and mass-weighted; resolution rewards bins whose accuracy strays
    from the base rate (a calibrated-but-useless model has both ~0);
    uncertainty is the irreducible base(1-base).

    Pinned integer semantics (int64-overflow-safe to ~9e12 rows):
    every squared term is truncated to MICRO units per row/bin BEFORE
    the sum (``(s - y*1e6)^2 DIV 1e6``, ``n_m * (gap^2 DIV 1e6)``) —
    exact integer totals under any partitioning — and each component
    is one truncating division by N.  Output one row:
    (n, base_ppm, brier_micro, rel_micro, res_micro, unc_micro,
    resid_micro)."""
    binned = scored.select(
        F.least(
            F.expr(f"CAST({score_col} AS BIGINT) * {n_bins} DIV {PPM}"),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin"),
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("long").alias("y"),
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_m"),
        F.sum("y").cast("long").alias("pos"),
        F.sum("s").cast("long").alias("s_sum"),
        F.sum(
            F.expr(f"(s - y * {PPM}) * (s - y * {PPM}) DIV {PPM}")
        ).cast("long").alias("sq_sum"),
    )
    terms = bins.select(
        "n_m",
        "pos",
        "sq_sum",
        F.expr(f"s_sum DIV n_m").alias("conf_ppm"),
        F.expr(f"pos * {PPM} DIV n_m").alias("acc_ppm"),
    )
    agg = terms.agg(
        F.sum("n_m").cast("long").alias("n"),
        F.sum("sq_sum").cast("long").alias("brier_num"),
        F.sum(
            F.expr(
                "n_m * ((conf_ppm - acc_ppm) * (conf_ppm - acc_ppm)"
                f" DIV {PPM})"
            )
        ).cast("long").alias("rel_num"),
    )
    # resolution needs the base rate, a scalar of the same aggregate —
    # compute in a second pass over the M-row terms table (broadcast)
    base = terms.agg(
        F.expr(f"sum(pos) * {PPM} DIV sum(n_m)").cast("long").alias(
            "base_ppm"
        )
    )
    res = (
        terms.crossJoin(F.broadcast(base))
        .agg(
            F.sum(
                F.expr(
                    "n_m * ((acc_ppm - base_ppm) * (acc_ppm - base_ppm)"
                    f" DIV {PPM})"
                )
            ).cast("long").alias("res_num")
        )
    )
    return (
        agg.crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(res))
        .select(
            "n",
            "base_ppm",
            F.expr("brier_num DIV n").alias("brier_micro"),
            F.expr("rel_num DIV n").alias("rel_micro"),
            F.expr("res_num DIV n").alias("res_micro"),
            F.expr(
                f"base_ppm * ({PPM} - base_ppm) DIV {PPM}"
            ).alias("unc_micro"),
        )
        .select(
            "n",
            "base_ppm",
            "brier_micro",
            "rel_micro",
            "res_micro",
            "unc_micro",
            F.expr(
                "brier_micro - (rel_micro - res_micro + unc_micro)"
            ).alias("resid_micro"),
        )
    )
