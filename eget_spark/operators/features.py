"""Feature ranking by information gain (mutual information with the
label).

Before training a q150-style quality classifier, the standard question
is which cheap metadata features carry signal: information gain
IG(label; f) = H(label) - H(label | f) — equivalently the mutual
information — ranks them (Quinlan's ID3/C4.5 split criterion, 1986;
Cover & Thomas).  A feature with IG near zero is dead weight; one
approaching H(label) nearly determines the label (and is probably
leakage).

Pinned semantics (the q244/q249 quantize-before-sum discipline; every
statistic is its OWN quantized sum, never derived by subtraction):

- cells n_vl, margins n_v / n_l, total N: exact int64 aggregates per
  feature
- h_label_micro = sum_l round(-1e6 * (n_l/N) * ln(n_l/N))
- h_cond_micro  = sum_{v,l} round(1e6 * (n_vl/N) * ln(n_v/n_vl))
- ig_micro      = sum_{v,l} round(1e6 * (n_vl/N) *
                  ln((n_vl*N in DOUBLE)/(n_v*n_l in DOUBLE)))

Scale shape (100 TB): the melt is a projection + explode (rows x
|features|); ONE map-side-combined groupBy to (feature, value, label)
cells — combine absorbs all skew; margins are groupBys OF the cell
table; label margins and N ride broadcasts.  No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def info_gain(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
) -> DataFrame:
    """(feature, n_values, h_label_micro, h_cond_micro, ig_micro) per
    feature, ordered by ig_micro desc then feature."""
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feat"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in feature_cols
                ]
            )
        ).alias("e"),
        F.col(label_col).cast("string").alias("lbl"),
    ).select(F.col("e.feat").alias("feat"), F.col("e.val").alias("val"),
             "lbl")
    cells = melted.groupBy("feat", "val", "lbl").agg(
        F.count("*").cast("long").alias("n_vl")
    )
    vm = cells.groupBy("feat", "val").agg(
        F.sum("n_vl").cast("long").alias("n_v")
    )
    lm = cells.groupBy("feat", "lbl").agg(
        F.sum("n_vl").cast("long").alias("n_l")
    )
    tot = lm.groupBy("feat").agg(F.sum("n_l").cast("long").alias("n"))

    h_label = (
        lm.join(F.broadcast(tot), "feat")
        .select(
            "feat",
            F.round(
                -1e6
                * (F.col("n_l").cast("double") / F.col("n").cast("double"))
                * F.log(
                    F.col("n_l").cast("double") / F.col("n").cast("double")
                )
            )
            .cast("long")
            .alias("t"),
        )
        .groupBy("feat")
        .agg(F.sum("t").cast("long").alias("h_label_micro"))
    )
    joined = (
        cells.join(vm, ["feat", "val"])
        .join(F.broadcast(lm), ["feat", "lbl"])
        .join(F.broadcast(tot), "feat")
    )
    p_vl = F.col("n_vl").cast("double") / F.col("n").cast("double")
    per_feat = joined.select(
        "feat",
        F.round(
            1e6
            * p_vl
            * F.log(
                F.col("n_v").cast("double") / F.col("n_vl").cast("double")
            )
        )
        .cast("long")
        .alias("hc_t"),
        F.round(
            1e6
            * p_vl
            * F.log(
                (F.col("n_vl").cast("double") * F.col("n").cast("double"))
                / (F.col("n_v").cast("double") * F.col("n_l").cast("double"))
            )
        )
        .cast("long")
        .alias("ig_t"),
    ).groupBy("feat").agg(
        F.sum("hc_t").cast("long").alias("h_cond_micro"),
        F.sum("ig_t").cast("long").alias("ig_micro"),
    )
    nv = vm.groupBy("feat").agg(F.count("*").cast("long").alias("n_values"))
    return (
        nv.join(h_label, "feat")
        .join(per_feat, "feat")
        .select(
            F.col("feat").alias("feature"),
            "n_values",
            "h_label_micro",
            "h_cond_micro",
            "ig_micro",
        )
        .orderBy(F.col("ig_micro").desc(), "feature")
    )
