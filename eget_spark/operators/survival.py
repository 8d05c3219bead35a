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
