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


def fleiss_kappa(
    ratings: DataFrame,
    item_col: str = "item",
    label_col: str = "label",
    m: int = 3,
) -> DataFrame:
    """Fleiss' kappa (Fleiss, Psychological Bulletin 1971) — chance-
    corrected agreement for a FIXED number ``m`` of raters per item
    (raters need not be the same people across items, unlike Cohen).

    Input is long format: one row per (item, label) vote; every item
    must carry exactly ``m`` votes (caller contract — enforced items
    with a different count are dropped, and the dropped count is
    reported so silent truncation can't masquerade as coverage).

    Pinned semantics: per-item agreement numerator ``sum_c n_ic^2 - m``
    is an exact int64; P_o = round(sum_items(.) / (N*m*(m-1)), 6) — ONE
    double division; P_e = round(sum_c cnt_c^2 / (N*m)^2, 6); kappa =
    round((po-pe)/(1-pe), 6), NULL when pe == 1.

    Scale shape (100 TB): one map-side-combined groupBy to (item,
    label) counts, one to per-item sums, one label-space margin — every
    post-aggregate table is item- or label-sized; scalars ride 1-row
    broadcasts.  No windows, no Python."""
    votes = ratings.select(
        F.col(item_col).alias("i"), F.col(label_col).alias("c")
    ).where(F.col(label_col).isNotNull())
    cell = votes.groupBy("i", "c").agg(F.count("*").cast("long").alias("n"))
    per_item = cell.groupBy("i").agg(
        F.sum("n").cast("long").alias("mi"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sq"),
    )
    valid = per_item.where(F.col("mi") == m)
    dropped = per_item.agg(
        F.sum((F.col("mi") != m).cast("long")).cast("long").alias(
            "n_dropped"
        )
    )
    obs = valid.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.col("sq") - m).cast("long").alias("agree_num"),
    )
    margins = (
        cell.join(valid.select("i"), "i")
        .groupBy("c")
        .agg(F.sum("n").cast("long").alias("nc"))
    )
    chance = margins.agg(
        F.coalesce(F.sum(F.col("nc") * F.col("nc")), F.lit(0))
        .cast("long")
        .alias("pe_num")
    )
    po = F.round(
        F.col("agree_num")
        / (F.col("n_items") * F.lit(m) * F.lit(m - 1)).cast("double"),
        6,
    )
    # square in DOUBLE: (N*m)^2 overflows int64 past ~3e9 ratings
    nm = (F.col("n_items") * F.lit(m)).cast("double")
    pe = F.round(F.col("pe_num") / (nm * nm), 6)
    return (
        obs.crossJoin(F.broadcast(chance))
        .crossJoin(F.broadcast(dropped))
        .select(
            "n_items", "n_dropped", po.alias("po"), pe.alias("pe")
        )
        .select(
            "n_items",
            "n_dropped",
            "po",
            "pe",
            F.when(
                F.col("pe") < 1.0,
                F.round((F.col("po") - F.col("pe")) / (1.0 - F.col("pe")), 6),
            ).alias("kappa"),
        )
    )


def krippendorff_alpha(
    ratings: DataFrame,
    item_col: str = "item",
    label_col: str = "label",
) -> DataFrame:
    """Krippendorff's alpha for NOMINAL data (Krippendorff, Content
    Analysis 1980/2004) — the agreement coefficient that tolerates
    MISSING ratings: items carry any number of votes, items with fewer
    than 2 are excluded (they contain no pair information).  This is
    the realistic LLM-judge / crowd setting where q253 (exactly 2
    fixed raters) and q261 (exactly m raters) don't apply.

    Pinned semantics (the q226 quantize-before-sum discipline): per
    item, ordered disagreeing pairs ``dis_i = m_i^2 - sum_c n_ic^2``
    and its pairable weight ``q_i = dis_i * 1_000_000 DIV (m_i - 1)``
    are exact int64; with n = total pairable votes and pooled margins
    n_c,

        alpha = round(1 - (n-1) * sum_i q_i
                          / ((n^2 - sum_c n_c^2) * 1e6), 6)

    — ONE double division.  alpha is NULL when the expected
    disagreement is zero (every vote the same label: agreement is
    vacuous).  Output: (n_items, n_votes, do_micro, de_num, alpha).

    Scale shape: identical aggregate ladder to :func:`fleiss_kappa` —
    (item, label) cells, item sums, pooled label margins, broadcast
    scalars; no windows, no Python."""
    votes = ratings.select(
        F.col(item_col).alias("i"), F.col(label_col).alias("c")
    ).where(F.col(label_col).isNotNull())
    cell = votes.groupBy("i", "c").agg(F.count("*").cast("long").alias("n"))
    per_item = cell.groupBy("i").agg(
        F.sum("n").cast("long").alias("mi"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sq"),
    )
    valid = per_item.where(F.col("mi") >= 2)
    obs = valid.select(
        F.col("i"),
        F.col("mi"),
        F.expr(
            "(mi * mi - sq) * CAST(1000000 AS BIGINT) DIV (mi - 1)"
        ).alias("qi"),
    ).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("mi").cast("long").alias("n_votes"),
        F.coalesce(F.sum("qi"), F.lit(0)).cast("long").alias("do_micro"),
    )
    margins = (
        cell.join(valid.select("i"), "i")
        .groupBy("c")
        .agg(F.sum("n").cast("long").alias("nc"))
    )
    chance = margins.agg(
        F.coalesce(F.sum(F.col("nc") * F.col("nc")), F.lit(0))
        .cast("long")
        .alias("sq_marg")
    )
    de_num = (
        F.col("n_votes") * F.col("n_votes") - F.col("sq_marg")
    ).cast("long")
    return (
        obs.crossJoin(F.broadcast(chance))
        .select(
            "n_items",
            "n_votes",
            "do_micro",
            de_num.alias("de_num"),
        )
        .select(
            "n_items",
            "n_votes",
            "do_micro",
            "de_num",
            F.when(
                F.col("de_num") > 0,
                # numerator in DOUBLE: (n-1)*do_micro overflows int64
                # on billion-vote ledgers
                F.round(
                    1.0
                    - (
                        (F.col("n_votes") - 1).cast("double")
                        * F.col("do_micro").cast("double")
                    )
                    / (F.col("de_num").cast("double") * 1e6),
                    6,
                ),
            ).alias("alpha"),
        )
    )
