"""Bradley-Terry preference-strength aggregation (MM fixed point).

Given pairwise win counts between items, the Bradley-Terry model
(Bradley & Terry 1952) assigns each item a positive strength p_i such
that P(i beats j) = p_i / (p_i + p_j); Hunter (2004, Annals of
Statistics) gives the standard MM iteration

    p_i  <-  W_i / sum_{j != i} n_ij / (p_i + p_j)

where W_i is i's total wins and n_ij the number of i-vs-j comparisons.
Preference aggregation is how training pipelines turn noisy pairwise
judgments (quality raters, LLM-judge A/B votes, interleaved search
clicks) into a single ranking — the same model underlies Elo-style
leaderboards.

Pinned integer semantics (the SimRank/PageRank fixed-point discipline,
so the DuckDB oracle reproduces every iterate bit-for-bit):

- strengths live in int64 MICRO units, p0 = 1e6 for every item
- per round: ``term_ij = (n_ij * 1e12) div max(p_i + p_j, 1)`` (exact
  integer), ``denom_i = sum_j term_ij``, ``p_i' = (W_i * 1e12) div
  max(denom_i, 1)``, then renormalized to total mass S*1e6 via
  ``p_i'' = (p_i' * S * 1e6) div max(sum p', 1)`` — every step a
  truncating integer division, no doubles anywhere
- ``n_rounds`` pinned (default 3); ties in the final ordering break on
  the item key

Scale shape (100 TB): the comparison matrix is one row per ordered item
pair — item cardinality (sources, hosts, model variants) is small by
construction, so every round is a broadcast-sized join; the expensive
part is DERIVING the win counts from raw data, which callers do with
the window-cumulative shape (see q250: per-value histograms + an
exclusive running sum — never a quadratic doc-pair join).  Rounds
localCheckpoint like the other fixed-point operators so the final plan
reads a materialized state table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000  # micro units
SQ = SCALE * SCALE


def pairwise_wins_by_value(
    df: DataFrame, item_col: str, value_col: str
) -> DataFrame:
    """(a, b, wins): for each ordered item pair, how many (row in a,
    row in b) pairs have a's value strictly greater.  Computed without
    a quadratic row-pair join: per-item value histograms joined against
    an exclusive running count over the global value order (one window
    per item, one equi-join on the value key)."""
    hist = (
        df.select(F.col(item_col).alias("item"), F.col(value_col).alias("v"))
        .groupBy("item", "v")
        .agg(F.count("*").cast("long").alias("c"))
    )
    vals = hist.select("v").distinct()
    items = hist.select("item").distinct()
    grid = vals.crossJoin(F.broadcast(items)).join(
        hist, ["item", "v"], "left"
    ).select("item", "v", F.coalesce("c", F.lit(0)).alias("c"))
    w = (
        Window.partitionBy("item")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        F.col("item").alias("b"),
        "v",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long").alias("below"),
    )
    return (
        hist.select(F.col("item").alias("a"), "v", "c")
        .join(cum, "v")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("c") * F.col("below")).cast("long").alias("wins"))
        .where(F.col("wins") > 0)
    )


def bradley_terry_fixed(
    wins: DataFrame, items: DataFrame, n_rounds: int = 3
) -> DataFrame:
    """(item, wins, comparisons, bt_fp) — MM fixed point over a
    (a, b, wins) table; ``items`` is a 1-column frame naming every item
    (never-compared items stay in the output, falling to strength 0
    after the first round — no wins, no denominator).  Ordered by
    (bt_fp desc, item)."""
    pairs = (
        wins.select(F.col("a").alias("i"), F.col("b").alias("j"),
                    F.col("wins").alias("w_ij"))
        .join(
            wins.select(F.col("b").alias("i"), F.col("a").alias("j"),
                        F.col("wins").alias("w_ji")),
            ["i", "j"],
            "outer",
        )
        .select(
            "i",
            "j",
            F.coalesce("w_ij", F.lit(0)).cast("long").alias("w_ij"),
            (F.coalesce("w_ij", F.lit(0)) + F.coalesce("w_ji", F.lit(0)))
            .cast("long")
            .alias("n_ij"),
        )
    )
    totals = pairs.groupBy("i").agg(
        F.sum("w_ij").cast("long").alias("w_tot"),
        F.sum("n_ij").cast("long").alias("n_tot"),
    )
    item_col = items.columns[0]
    base = items.select(F.col(item_col).alias("i")).join(
        totals, "i", "left"
    ).select(
        "i",
        F.coalesce("w_tot", F.lit(0)).alias("w_tot"),
        F.coalesce("n_tot", F.lit(0)).alias("n_tot"),
    )
    n_items = base.agg(F.count("*").cast("long").alias("s"))

    p = base.select("i", F.lit(SCALE).cast("long").alias("p")).localCheckpoint()
    for _ in range(n_rounds):
        denom = (
            pairs.join(p.withColumnRenamed("i", "j").withColumnRenamed("p", "pj"), "j")
            .join(p.withColumnRenamed("p", "pi"), "i")
            .select(
                "i",
                F.expr(f"n_ij * CAST({SQ} AS BIGINT) DIV greatest(pi + pj, 1)")
                .cast("long")
                .alias("term"),
            )
            .groupBy("i")
            .agg(F.sum("term").cast("long").alias("denom"))
        )
        raw = (
            base.join(denom, "i", "left")
            .select(
                "i",
                F.expr(
                    f"w_tot * CAST({SQ} AS BIGINT)"
                    " DIV greatest(coalesce(denom, 0), 1)"
                )
                .cast("long")
                .alias("pr"),
            )
        )
        mass = raw.agg(F.sum("pr").cast("long").alias("tot"))
        p = (
            raw.crossJoin(F.broadcast(mass))
            .crossJoin(F.broadcast(n_items))
            .select(
                "i",
                F.expr(f"pr * (s * CAST({SCALE} AS BIGINT)) DIV greatest(tot, 1)")
                .cast("long")
                .alias("p"),
            )
            .localCheckpoint()
        )
    return (
        base.join(p, "i")
        .select(
            F.col("i").alias("item"),
            F.col("w_tot").alias("wins"),
            F.col("n_tot").alias("comparisons"),
            F.col("p").alias("bt_fp"),
        )
        .orderBy(F.col("bt_fp").desc(), "item")
    )
