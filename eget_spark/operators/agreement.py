"""Inter-rater agreement: Cohen's kappa over paired categorical labels.

Training-data pipelines lean on human (or LLM-judge) labels — quality
tiers, topic tags, safety flags.  Raw percent agreement overstates
reliability because raters agree by chance on skewed label
distributions; Cohen's kappa (Cohen, Educational and Psychological
Measurement 1960) corrects for it:

    kappa = (p_o - p_e) / (1 - p_e)

with p_o the observed agreement rate and p_e the chance rate implied by
the two raters' marginal label distributions, ``p_e = sum_c p_a(c) *
p_b(c)``.  Landis & Koch (Biometrics 1977) supply the conventional
strength bands (<0 poor, 0.61-0.80 substantial, ...).  The q250
Bradley-Terry operator ranks items FROM preferences; kappa asks the
prior question — whether the raters are consistent enough for any of
that to mean anything.

Pinned semantics (so the DuckDB oracle is bit-exact):

- input is one row per item with both raters' labels; NULL labels drop
  the row (both raters must have voted)
- po   = round(agree / n, 6)                        — exact int64 ratio
  rounded once as a double
- pe   = round(sum_c(na_c * nb_c) / n^2, 6)         — the numerator is
  an exact int64 sum of margin products, divided once
- kappa = round((po - pe) / (1 - pe), 6), NULL when pe == 1 (degenerate
  single-label margins on both sides: chance explains everything)

Each division happens exactly once on exact integer operands, so
cross-engine doubles are bit-identical (no cross-row float sums).

Scale shape (100 TB): p_o is ONE map-side-combined aggregate over the
pair table; the margins are two groupBys with at most |label-space|
keys each (combine absorbs all skew), joined on the tiny label key and
collapsed to one row.  Everything after the first aggregate is
label-space sized — broadcast class.  No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohens_kappa(
    ratings: DataFrame,
    rater_a_col: str = "label_a",
    rater_b_col: str = "label_b",
) -> DataFrame:
    """One-row result: (n_items, agree, po, pe, kappa)."""
    pairs = ratings.select(
        F.col(rater_a_col).alias("a"), F.col(rater_b_col).alias("b")
    ).where(F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull())

    obs = pairs.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(
            F.when(F.col("a") == F.col("b"), 1).otherwise(0)
        )
        .cast("long")
        .alias("agree"),
    )
    ma = pairs.groupBy(F.col("a").alias("c")).agg(
        F.count("*").cast("long").alias("na")
    )
    mb = pairs.groupBy(F.col("b").alias("c")).agg(
        F.count("*").cast("long").alias("nb")
    )
    # inner join: a label missing from either margin contributes 0
    # (coalesce covers fully disjoint label spaces -> pe_num 0)
    chance = ma.join(mb, "c").agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
        .cast("long")
        .alias("pe_num")
    )
    po = F.round(F.col("agree") / F.col("n_items"), 6)
    pe = F.round(
        F.col("pe_num") / (F.col("n_items") * F.col("n_items")), 6
    )
    return (
        obs.crossJoin(F.broadcast(chance))
        .select(
            "n_items",
            "agree",
            po.alias("po"),
            pe.alias("pe"),
        )
        .select(
            "n_items",
            "agree",
            "po",
            "pe",
            F.when(
                F.col("pe") < 1.0,
                F.round((F.col("po") - F.col("pe")) / (1.0 - F.col("pe")), 6),
            ).alias("kappa"),
        )
    )
