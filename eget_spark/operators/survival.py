"""Kaplan-Meier survival curves for page lifetimes.

How long does a web page live before it changes or disappears?  The
recrawl literature mostly ASSUMES exponential lifetimes (Cho &
Garcia-Molina TOIT 2003 — the q243 refresh-policy comparison and the
q187 Poisson rate both inherit that assumption); the Kaplan-Meier
product-limit estimator (JASA 1958) is the standard NONPARAMETRIC
check: it estimates S(t) = P(lifetime > t) directly from observed
change times WITH right-censoring (pages still unchanged when the
observation window closed contribute risk exposure but no event —
throwing them away biases lifetimes short, which over-crawls).  If the
KM curve is exponential-ish, q243's policies stand; a heavy tail says
"cohort the long-lived pages onto a slower refresh tier".

    S(t) = prod over event times t_i <= t of (1 - d_i / n_i)

with d_i events at t_i and n_i = pages still at risk just before t_i.

Pinned semantics (cross-engine exactness — the corpus_stats quantized-
transcendental discipline):
- integer durations and 0/1 event flags (caller casts);
- per event time, the log-factor ``lnf_micro = round(1e6 *
  ln((n_i - d_i) / n_i))`` is quantized to int64 micro BEFORE the
  cumulative sum, so the running product is an EXACT integer prefix
  sum in log space regardless of partitioning or order;
- ``s_ppm = round(1e6 * exp(cum_lnf / 1e6))`` — the ln/exp pair is the
  engine-pinned transcendental family (q283 discipline);
- if every at-risk page dies at once (n_i = d_i) the survival hits
  exact zero and ln is undefined: the pin is a sticky zero flag — that
  time and every later time in the group emit ``s_ppm = 0``;
- censor-only times carry the curve unchanged (d_i = 0 -> factor 1,
  lnf 0) but are emitted with their censor counts so the at-risk
  bookkeeping is auditable.

Scale shape (100 TB): one map-side-combined groupBy((group, t))
collapses the page ledger to the TIME table (distinct durations per
group — observation-window-bounded, e.g. <= days-in-year rows per
host); the at-risk counts and the log-space product are TWO frames
over ONE Window spec (group, ORDER BY t) — a single hash exchange on
group, the cusum_drift partitioning-reuse discipline.  No joins, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    group_col: str = "source",
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """(grp, t, n_risk, d_events, c_censored, s_ppm) per distinct
    observed time per group, ascending — s_ppm is the product-limit
    survival estimate just AFTER t, in exact ppm."""
    per_t = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("long").alias("e"),
        )
        .groupBy("grp", "t")
        .agg(
            F.sum("e").cast("long").alias("d_events"),
            (F.count("*") - F.sum("e")).cast("long").alias("c_censored"),
            F.count("*").cast("long").alias("n_at_t"),
        )
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # at risk just before t = group total minus everything that left
    # at earlier times; both running frames share the one window spec
    at_risk = per_t.select(
        "grp",
        "t",
        "d_events",
        "c_censored",
        (
            F.sum("n_at_t").over(
                Window.partitionBy("grp").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.sum("n_at_t").over(w)
            + F.col("n_at_t")
        ).cast("long").alias("n_risk"),
    )
    lnf = at_risk.select(
        "*",
        F.expr(
            "CASE WHEN d_events = 0 THEN CAST(0 AS BIGINT) "
            "WHEN n_risk > d_events THEN CAST(round(1e6 * "
            "ln(CAST(n_risk - d_events AS DOUBLE) "
            "/ CAST(n_risk AS DOUBLE))) AS BIGINT) END"
        ).alias("lnf_micro"),
    )
    w2 = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = lnf.select(
        "grp",
        "t",
        "n_risk",
        "d_events",
        "c_censored",
        F.max(
            (F.col("lnf_micro").isNull()).cast("int")
        ).over(w2).alias("_dead"),
        F.sum(F.coalesce(F.col("lnf_micro"), F.lit(0))).over(w2).alias(
            "_cum"
        ),
    )
    return stepped.select(
        "grp",
        "t",
        "n_risk",
        "d_events",
        "c_censored",
        F.expr(
            "CASE WHEN _dead = 1 THEN CAST(0 AS BIGINT) "
            "ELSE CAST(round(1e6 * exp(CAST(_cum AS DOUBLE) / 1e6)) "
            "AS BIGINT) END"
        ).alias("s_ppm"),
    ).orderBy("grp", "t")


def log_rank(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample log-rank (Mantel-Cox) test: are the ``group_a`` and
    ``group_b`` lifetime distributions different?  (Mantel 1966; Peto &
    Peto JRSS-A 1972.)  The hypothesis-test companion to
    :func:`kaplan_meier` — KM draws the two curves, log-rank says
    whether the gap is noise, which is the decision "do these two host
    tiers need different refresh schedules".

    At each pooled event time: observed-minus-expected
    ``d_a - d * n_a/n`` and the hypergeometric variance
    ``d * (n_a/n) * (1 - n_a/n) * (n - d)/(n - 1)``;
    z = sum(O-E) / sqrt(sum(V)), two-sided p via the pinned A&S erfc.

    Pinned semantics: per-event-time contributions are quantized to
    exact MICRO int64 (``oe_micro``, ``v_micro`` — single pinned double
    chains over exact at-risk/event counts) BEFORE the cross-time sums,
    so the totals are exact integers under any partitioning (the
    corpus_stats discipline); times with n <= 1 or d = 0 contribute
    nothing (the standard convention); z =
    ``sum_oe / (1000 * sqrt(sum_v))`` (micro units cancel), NULL when
    the variance sum is zero.  Output one row:
    (n_a, n_b, n_times, sum_oe_micro, sum_v_micro, z, p_ppm).

    Scale shape (100 TB): the ledger collapses to the pooled EVENT-TIME
    table (observation-window-bounded) via one map-side-combined
    groupBy; the at-risk windows run over that bounded table (single
    ordered partition by design — swap in the sequence module's
    range-partitioned prefix sums if the time axis outgrows one
    partition); one single-row agg.  No joins, no Python.
    """
    from eget_spark.operators.fdr import p_two_sided_ppm_sql

    base = df.where(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        (F.col(group_col) == F.lit(group_a)).cast("long").alias("is_a"),
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("long").alias("e"),
    )
    per_t = base.groupBy("t").agg(
        F.sum(F.col("is_a") * F.col("e")).cast("long").alias("d_a"),
        F.sum("e").cast("long").alias("d"),
        F.sum("is_a").cast("long").alias("m_a"),
        F.count("*").cast("long").alias("m"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t",
        "d_a",
        "d",
        (
            F.sum("m_a").over(w_all) - F.sum("m_a").over(w_cum)
            + F.col("m_a")
        ).cast("long").alias("n_a_t"),
        (
            F.sum("m").over(w_all) - F.sum("m").over(w_cum) + F.col("m")
        ).cast("long").alias("n_t"),
        F.sum("m_a").over(w_all).cast("long").alias("tot_a"),
        F.sum("m").over(w_all).cast("long").alias("tot"),
    )
    contrib = risk.select(
        "tot_a",
        "tot",
        F.expr(
            "CASE WHEN d > 0 AND n_t > 1 THEN CAST(round(1e6 * "
            "(CAST(d_a AS DOUBLE) - CAST(d AS DOUBLE) "
            "* CAST(n_a_t AS DOUBLE) / CAST(n_t AS DOUBLE))) AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("oe_micro"),
        F.expr(
            "CASE WHEN d > 0 AND n_t > 1 THEN CAST(round(1e6 * "
            "(CAST(d AS DOUBLE) * (CAST(n_a_t AS DOUBLE) "
            "/ CAST(n_t AS DOUBLE)) * (1.0 - CAST(n_a_t AS DOUBLE) "
            "/ CAST(n_t AS DOUBLE)) * CAST(n_t - d AS DOUBLE) "
            "/ CAST(n_t - 1 AS DOUBLE))) AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("v_micro"),
        F.expr(
            "CASE WHEN d > 0 AND n_t > 1 THEN CAST(1 AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("counted"),
    )
    agg = contrib.groupBy("tot_a", "tot").agg(
        F.sum("counted").cast("long").alias("n_times"),
        F.sum("oe_micro").cast("long").alias("sum_oe_micro"),
        F.sum("v_micro").cast("long").alias("sum_v_micro"),
    )
    z = (
        "(CAST(sum_oe_micro AS DOUBLE)"
        " / (1000.0 * sqrt(CAST(sum_v_micro AS DOUBLE))))"
    )
    return agg.select(
        F.col("tot_a").alias("n_a"),
        (F.col("tot") - F.col("tot_a")).cast("long").alias("n_b"),
        "n_times",
        "sum_oe_micro",
        "sum_v_micro",
        F.expr(
            f"CASE WHEN sum_v_micro > 0 THEN round({z}, 6) END"
        ).alias("z"),
        F.expr(
            f"CASE WHEN sum_v_micro > 0 THEN {p_two_sided_ppm_sql(z)} END"
        ).alias("p_ppm"),
    )
