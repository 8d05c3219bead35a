"""Extreme-value tail fitting: GPD over threshold exceedances.

"What latency should we budget for the 1-in-a-million fetch?" is a
TAIL question, and empirical quantiles can't answer it beyond the data
(the millionth-worst observation needs a million observations — and
says nothing about the ten-millionth).  Extreme-value theory can: by
Pickands-Balkema-de Haan, threshold exceedances of ANY reasonable
distribution converge to the Generalized Pareto Distribution, so fit
GPD(xi, sigma) to the exceedances and extrapolate.  The estimator here
is probability-weighted moments (Hosking & Wallis, Technometrics
1987) — CLOSED FORM, no optimizer:

    b0 = mean(e)
    a1 = sum_{i} ((n-i)/(n-1)) e_(i) / n        (ascending ranks i;
                                                 the alpha-moment
                                                 E[X (1-F(X))])
    xi = 2 - b0 / (b0 - 2 a1)
    sigma = 2 b0 a1 / (b0 - 2 a1)

and the m-observation return level (with zeta = P(X > u)):

    x_m = u + (sigma / xi) * ((m * zeta)^xi - 1)

The tail-risk companion to q274's Hill index (Hill assumes xi > 0 and
fits the log-tail slope; PWM-GPD also handles light/bounded tails and
yields actual return LEVELS, not just the exponent).

Pinned semantics:
- integer values and threshold; exceedances e = x - u > 0 exact;
- ranks from the range-partitioned global sequence (never a
  SinglePartition window over data); the a1 numerator
  ``sum (n - rank) * e`` is EXACT int64 — rank-tie order is provably
  irrelevant (tied e are equal, so any permutation of a tie block
  sums identically) — with the documented envelope
  n * max_e * n <~ 9e18 (a 1e6-row exceedance set with 1e6-scale
  values is the edge; subsample beyond);
- xi / sigma / return level are single pinned IEEE chains over the
  exact sums; ``pow`` goes through the pinned exp/ln family
  (``exp(xi * ln(m * zeta))``); degenerate tails (b0 = 2 b1 exactly,
  or no exceedances, or xi = 0) emit NULL fit/level rather than a
  division blow-up.

Scale shape (100 TB): the threshold filter pushes to the scan, ONE
range exchange sequences the (already rare) exceedances, one
single-row agg.  No joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gpd_tail_fit(
    df: DataFrame,
    value_col: str,
    threshold: int,
    return_period: int = 1_000_000,
) -> DataFrame:
    """One row: (n_total, n_exceed, threshold, b0_sum, a1_num, xi,
    sigma, return_level) — the PWM-GPD tail fit and the
    ``return_period``-observation return level."""
    from eget_spark.operators.sequence import with_global_seq

    u = int(threshold)
    vals = df.select(F.col(value_col).cast("long").alias("x"))
    n_total = vals.count()
    exceed = vals.where(F.col("x") > u).select(
        (F.col("x") - u).alias("e")
    )
    res = with_global_seq(exceed, ["e"], start=1, seq_col="_i")
    # the alpha-moment weight is (n - rank); n is not known until the
    # aggregate, so sum rank*e exactly and form
    # a1_num = n*b0_sum - sum(rank*e) afterwards (all exact int64)
    agg0 = res.df.agg(
        F.count("*").cast("long").alias("n_exceed"),
        F.sum("e").cast("long").alias("b0_sum"),
        F.sum(F.col("_i") * F.col("e")).cast("long").alias("ri_sum"),
    )
    agg = agg0.select(
        "n_exceed",
        "b0_sum",
        F.expr("n_exceed * b0_sum - ri_sum").cast("long").alias(
            "a1_num"
        ),
    ).localCheckpoint()
    res.unpersist()
    n = "CAST(n_exceed AS DOUBLE)"
    b0 = f"(CAST(b0_sum AS DOUBLE) / {n})"
    b1 = (
        f"(CAST(a1_num AS DOUBLE)"
        f" / ({n} * CAST(n_exceed - 1 AS DOUBLE)))"
    )
    den = f"({b0} - 2.0 * {b1})"
    xi = f"(2.0 - {b0} / {den})"
    sigma = f"(2.0 * {b0} * {b1} / {den})"
    zeta = f"(CAST(n_exceed AS DOUBLE) / {float(n_total)})"
    growth = (
        f"(exp({xi} * ln({float(return_period)} * {zeta})) - 1.0)"
    )
    rl = f"({float(u)} + ({sigma} / {xi}) * {growth})"
    # degenerate-denominator test done in EXACT integers:
    # b0 - 2*b1 = [b0_sum*(n-1) - 2*a1_num] / (n*(n-1))
    ok = "n_exceed > 1 AND b0_sum * (n_exceed - 1) <> 2 * a1_num"
    ok_rl = f"{ok} AND {xi} <> 0.0 AND {float(return_period)} * {zeta} > 0.0"
    return agg.select(
        F.lit(int(n_total)).cast("long").alias("n_total"),
        "n_exceed",
        F.lit(u).cast("long").alias("threshold"),
        "b0_sum",
        "a1_num",
        F.expr(f"CASE WHEN {ok} THEN round({xi}, 6) END").alias("xi"),
        F.expr(f"CASE WHEN {ok} THEN round({sigma}, 6) END").alias(
            "sigma"
        ),
        F.expr(
            f"CASE WHEN {ok_rl} THEN CAST(round({rl}) AS BIGINT) END"
        ).alias("return_level"),
    )
