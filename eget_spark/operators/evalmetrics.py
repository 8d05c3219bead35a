"""Ranking / classifier evaluation metrics: ROC-AUC, Average
Precision, nDCG, and Kendall's tau-b.

A curation pipeline is full of rankers — quality classifiers (q150),
BM25 (q74), centralities (q40/q84/q212) — and the question "is this
ranker any good / do these two rankers agree" needs the standard
evaluation metrics computed at corpus scale.  All four here reduce to
exact integer statistics plus a single final division, so they are
bit-identical across engines and partitionings.

Pinned semantics:

- ROC-AUC via the Mann-Whitney rank-sum identity (Mann & Whitney 1947;
  Hanley & McNeil 1982): with ascending-score midranks (doubled to stay
  integer: ``midrank_x2 = 2*rank_min + ties - 1``), AUC =
  ``(R2 - npos*(npos+1)) / (2*npos*nneg)`` where R2 = sum of positive
  midrank_x2 — exact ints, ONE round-6 double division.  Ties handled
  exactly (that's the midrank).
- Average Precision (the PASCAL/IR "AP"): rank by (score DESC, id) —
  the tie-break is part of the pin — and AP_ppm =
  ``sum over positives of (tp_i * 1e6 DIV i)  DIV  npos``.
- nDCG@k (Järvelin & Kekäläinen TOIS 2002): per-rank gain
  ``rel_i * 1e6 DIV log2_x6(i+1)`` is NOT integer-friendly, so the pin
  quantizes each rank's 1/log2(i+1) discount to micro units FIRST
  (``disc_i = round(1e6 / log2(i+1))``) and DCG_micro = sum of
  ``rel_i * disc_i`` — exact ints; ndcg_ppm = dcg * 1e6 DIV idcg.
- Kendall's tau-b (Kendall 1938/1945) between two integer-keyed
  rankings over the SAME items: concordant/discordant/tie counts from
  the capped pairwise self-join (the q256 cap discipline), tau_b =
  ``(C - D) / sqrt((n0 - tx)(n0 - ty))`` — exact ints, one double.

Scale shape (100 TB): the exact global order statistics AUC/AP need
come from ``with_global_seq`` (range-partitioned per-bucket rank +
broadcast prefix offsets — NEVER a SinglePartition window); nDCG's
window runs per QUERY partition; tau-b's cap selection is the same
global sequence and its pair join fans out a cap-bounded
(broadcast-class) table, cap^2/2 pairs.  No Python anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def roc_auc_ap(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    id_col: str = "id",
) -> DataFrame:
    """One row: (n, n_pos, n_neg, r2_pos, auc, ap_ppm)."""
    from .sequence import with_global_seq

    base = scored.select(
        F.col(id_col).alias("id"),
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("long").alias("y"),
    )
    # ascending midranks for Mann-Whitney, via the range-partitioned
    # exact global sequence (never a SinglePartition window): per-score
    # groups give rmin = min(seq) and the tie count, so the positive
    # midrank sum is sum over groups of pos * (2*rmin + ties - 1)
    res_asc = with_global_seq(base, ["s", "id"], start=1, seq_col="_r")
    groups = res_asc.df.groupBy("s").agg(
        F.min("_r").cast("long").alias("rmin"),
        F.count("*").cast("long").alias("ties"),
        F.sum("y").cast("long").alias("pos"),
    )
    agg_auc = groups.agg(
        F.sum("ties").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(
            F.col("pos") * (2 * F.col("rmin") + F.col("ties") - 1)
        )
        .cast("long")
        .alias("r2_pos"),
    ).localCheckpoint()
    res_asc.unpersist()
    # descending precision ranks for AP (tie-break by id: part of the
    # pin); the j-th positive at global position i contributes
    # j*PPM DIV i — j is the exact sequence over positives alone
    neg = base.withColumn("_negs", -F.col("s"))
    res_all = with_global_seq(neg, ["_negs", "id"], start=1, seq_col="_i")
    res_pos = with_global_seq(
        res_all.df.where(F.col("y") == 1),
        ["_negs", "id"],
        start=1,
        seq_col="_j",
    )
    agg_ap = res_pos.df.agg(
        F.coalesce(
            F.sum(F.expr(f"_j * CAST({PPM} AS BIGINT) DIV _i")), F.lit(0)
        )
        .cast("long")
        .alias("ap_num"),
    ).localCheckpoint()
    res_pos.unpersist()
    res_all.unpersist()
    return (
        agg_auc.crossJoin(F.broadcast(agg_ap))
        .select(
            "n",
            "n_pos",
            (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
            "r2_pos",
            "ap_num",
        )
        .select(
            "n",
            "n_pos",
            "n_neg",
            "r2_pos",
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.round(
                    (
                        F.col("r2_pos").cast("double")
                        - (F.col("n_pos") * (F.col("n_pos") + 1)).cast(
                            "double"
                        )
                    )
                    / (2.0 * F.col("n_pos").cast("double")
                       * F.col("n_neg").cast("double")),
                    6,
                ),
            ).alias("auc"),
            F.when(
                F.col("n_pos") > 0,
                F.expr("ap_num DIV n_pos"),
            )
            .cast("long")
            .alias("ap_ppm"),
        )
    )


def ndcg_at_k(
    ranked: DataFrame,
    query_col: str = "query",
    rank_col: str = "rnk",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """(query, dcg_micro, idcg_micro, ndcg_ppm) per query.

    ``ranked`` carries the system's rank (1-based) and an integer
    relevance grade per (query, item); ranks beyond ``k`` are ignored.
    The ideal ordering re-sorts the SAME top-k pool by (rel DESC,
    rank) — the standard local-ideal convention pinned here."""
    top = ranked.select(
        F.col(query_col).alias("q"),
        F.col(rank_col).cast("long").alias("i"),
        F.col(rel_col).cast("long").alias("rel"),
    ).where(F.col(rank_col) <= k)
    disc = F.round(F.lit(float(PPM)) / F.log2(F.col("i") + 1)).cast("long")
    dcg = top.select("q", (F.col("rel") * disc).alias("g")).groupBy("q").agg(
        F.sum("g").cast("long").alias("dcg_micro")
    )
    w = Window.partitionBy("q").orderBy(F.col("rel").desc(), "i")
    ideal = (
        top.withColumn("j", F.row_number().over(w))
        .select(
            "q",
            (
                F.col("rel")
                * F.round(F.lit(float(PPM)) / F.log2(F.col("j") + 1)).cast(
                    "long"
                )
            ).alias("g"),
        )
        .groupBy("q")
        .agg(F.sum("g").cast("long").alias("idcg_micro"))
    )
    return (
        dcg.join(ideal, "q")
        .select(
            F.col("q").alias(query_col),
            "dcg_micro",
            "idcg_micro",
            F.when(
                F.col("idcg_micro") > 0,
                F.expr(f"dcg_micro * CAST({PPM} AS BIGINT) DIV idcg_micro"),
            )
            .cast("long")
            .alias("ndcg_ppm"),
        )
        .orderBy(query_col)
    )


def kendall_tau_b(
    items: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_items: int = 200,
) -> DataFrame:
    """One row: (n_items, concordant, discordant, ties_x, ties_y,
    tau_b) over the first ``max_items`` items by id (pinned cap — the
    pair set is quadratic, the q256 discipline)."""
    from .sequence import with_global_seq

    res_cap = with_global_seq(
        items.select(
            F.col(id_col).alias("id"),
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"),
        ),
        ["id"],
        start=1,
        seq_col="_rn",
    )
    capped = (
        res_cap.df.where(F.col("_rn") <= max_items)
        .drop("_rn")
        .localCheckpoint()
    )
    res_cap.unpersist()
    a = capped.alias("a")
    b = capped.alias("b")
    dx = F.col("b.x") - F.col("a.x")
    dy = F.col("b.y") - F.col("a.y")
    # inequality-only join: broadcast the (cap-bounded) side explicitly
    # so it plans as BroadcastNestedLoopJoin, never CartesianProduct
    pairs = a.join(F.broadcast(b), F.col("a.id") < F.col("b.id")).select(
        (F.signum(dx.cast("double")) * F.signum(dy.cast("double")))
        .cast("long")
        .alias("prod"),
        (dx == 0).cast("long").alias("tx"),
        (dy == 0).cast("long").alias("ty"),
    )
    st = pairs.agg(
        F.count("*").cast("long").alias("n0"),
        F.sum((F.col("prod") == 1).cast("long")).cast("long").alias("c"),
        F.sum((F.col("prod") == -1).cast("long")).cast("long").alias("d"),
        F.sum("tx").cast("long").alias("ties_x"),
        F.sum("ty").cast("long").alias("ties_y"),
    )
    n_items = capped.agg(F.count("*").cast("long").alias("n_items"))
    return (
        st.crossJoin(F.broadcast(n_items))
        .select(
            "n_items",
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            "ties_x",
            "ties_y",
            F.when(
                ((F.col("n0") - F.col("ties_x")) > 0)
                & ((F.col("n0") - F.col("ties_y")) > 0),
                F.round(
                    (F.col("c") - F.col("d")).cast("double")
                    / F.sqrt(
                        (F.col("n0") - F.col("ties_x")).cast("double")
                        * (F.col("n0") - F.col("ties_y")).cast("double")
                    ),
                    6,
                ),
            ).alias("tau_b"),
        )
    )


def spearman_rho(
    items: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Spearman rank correlation with exact tie handling (Spearman
    1904; the midrank/Pearson-on-ranks form) — the whole-distribution
    complement to :func:`kendall_tau_b`: no pair join, so it runs over
    the FULL item set, not a capped sample.

    Pinned semantics: x/y midranks DOUBLED to stay integer (the q265
    recipe — ``2*rank_min + ties - 1`` from per-value groups of a
    with_global_seq sequence); rho = Pearson of the doubled midranks
    from exact int64 moment sums,

        rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    ONE round-6 double division; NULL when either ranking is constant.
    Int64 envelope: moments scale as n^3 — exact to n ≈ 1.3e6 items;
    beyond that pre-aggregate (rankings of hosts/sources, not pages) or
    accept the documented cap upstream.

    Scale shape (100 TB): two with_global_seq passes (range-partitioned
    rank + broadcast offsets), one value-group aggregate each, a hash
    join back on the value key, one map-side-combined moment aggregate.
    No SinglePartition window, no pair join, no Python."""
    from .sequence import with_global_seq

    base = items.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )

    def midranks(col: str, out: str) -> DataFrame:
        res = with_global_seq(base, [col, "id"], start=1, seq_col="_r")
        grp = (
            res.df.groupBy(col)
            .agg(
                F.min("_r").cast("long").alias("rmin"),
                F.count("*").cast("long").alias("ties"),
            )
            .select(
                col,
                (2 * F.col("rmin") + F.col("ties") - 1)
                .cast("long")
                .alias(out),
            )
            .localCheckpoint()
        )
        res.unpersist()
        return grp

    rx = midranks("x", "mx2")
    ry = midranks("y", "my2")
    ranked = base.join(rx, "x").join(ry, "y")
    mo = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("mx2").cast("long").alias("sx"),
        F.sum("my2").cast("long").alias("sy"),
        F.sum(F.col("mx2") * F.col("mx2")).cast("long").alias("sxx"),
        F.sum(F.col("my2") * F.col("my2")).cast("long").alias("syy"),
        F.sum(F.col("mx2") * F.col("my2")).cast("long").alias("sxy"),
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    return mo.select(
        "n",
        F.when((vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)).alias(
            "rho"
        ),
    )


def mcnemar_test(
    paired: DataFrame,
    a_col: str = "a_correct",
    b_col: str = "b_correct",
) -> DataFrame:
    """McNemar's paired-classifier test (McNemar, Psychometrika 1947):
    given per-item 0/1 correctness of two classifiers on the SAME
    items, only the discordant cells carry information — b = A right /
    B wrong, c = A wrong / B right; the continuity-corrected statistic

        chi2 = (|b - c| - 1)^2 / (b + c)

    (Edwards 1948 correction, the textbook default) decides whether the
    q150-style model you want to ship actually beats the incumbent on
    the same documents — the paired complement to q265's single-model
    AUC.  Pinned: exact int64 cells, ONE round-6 double division; chi2
    NULL when b + c == 0 (no discordance, no evidence either way).
    Output one row: (n_items, both_right, both_wrong, only_a, only_b,
    chi2).

    Scale shape: ONE map-side-combined aggregate over the pair table —
    four conditional sums; nothing else."""
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    agg = paired.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(((a == 1) & (b == 1)).cast("long"))
        .cast("long")
        .alias("both_right"),
        F.sum(((a == 0) & (b == 0)).cast("long"))
        .cast("long")
        .alias("both_wrong"),
        F.sum(((a == 1) & (b == 0)).cast("long"))
        .cast("long")
        .alias("only_a"),
        F.sum(((a == 0) & (b == 1)).cast("long"))
        .cast("long")
        .alias("only_b"),
    )
    disc = F.col("only_a") + F.col("only_b")
    dev = F.abs(F.col("only_a") - F.col("only_b")) - 1
    return agg.select(
        "n_items",
        "both_right",
        "both_wrong",
        "only_a",
        "only_b",
        F.when(
            disc > 0,
            F.round(
                (dev * dev).cast("double") / disc.cast("double"), 6
            ),
        ).alias("chi2"),
    )
