"""Mantel-Haenszel pooled comparison across strata.

"Fleet A's fetchers succeed more than fleet B's" is meaningless if A
got the easy hosts: pooled raw rates reverse under confounding
(Simpson's paradox — the crawl version is tier-dependent allocation,
where the canary fleet gets the well-behaved hosts).  The
Mantel-Haenszel estimator (JNCI 1959) pools the WITHIN-stratum 2x2
tables instead: with stratum table (a, b; c, d) (a = group-A
successes, b = A failures, c = B successes, d = B failures,
n = a+b+c+d),

    OR_MH = sum(a*d/n) / sum(b*c/n)

and the Cochran-Mantel-Haenszel test statistic

    z = sum(a - (a+b)(a+c)/n) / sqrt(sum V),
    V  = (a+b)(c+d)(a+c)(b+d) / (n^2 (n-1))

— the stratified companion to q272's single-table G-test and the
categorical sibling of q290's log-rank (which IS a CMH over event
times).

Pinned semantics (the q290 quantization discipline): every per-stratum
term is quantized to exact MICRO int64 via one pinned double chain
over exact counts (``r_micro = round(1e6*a*d/n)``, ``s_micro``,
``oe_micro``, ``v_micro``) BEFORE the cross-stratum sums, so totals
are exact integers under any partitioning; strata with n < 2 (the
variance needs n-1) or with a missing group are excluded — part of
the pin; OR_MH is one round-6 division of the exact sums (NULL when
sum_s = 0); z NULL when the variance sum is zero; two-sided p via the
fdr module's pinned A&S erfc.

Scale shape (100 TB): ONE map-side-combined groupBy(stratum) collapses
the ledger to the stratum table (tier/host-bounded), then a single-row
agg.  No windows, no joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mantel_haenszel(
    df: DataFrame,
    stratum_col: str,
    group_col: str,
    outcome_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One row: (n_strata, sum_r_micro, sum_s_micro, or_mh,
    sum_oe_micro, sum_v_micro, z, p_ppm) — the pooled A-vs-B odds
    ratio and CMH significance across strata."""
    from eget_spark.operators.fdr import p_two_sided_ppm_sql

    base = df.where(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(stratum_col).alias("stratum"),
        (F.col(group_col) == F.lit(group_a)).cast("long").alias("is_a"),
        F.col(outcome_col).cast("long").alias("y"),
    )
    cells = base.groupBy("stratum").agg(
        F.sum(F.col("is_a") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("is_a") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("is_a")) * F.col("y")).cast("long").alias("c"),
        F.sum(
            (1 - F.col("is_a")) * (1 - F.col("y"))
        ).cast("long").alias("d"),
    ).select(
        "*",
        F.expr("a + b + c + d").cast("long").alias("n"),
    )
    ok = "n > 1 AND a + b > 0 AND c + d > 0"
    contrib = cells.select(
        F.expr(f"CASE WHEN {ok} THEN 1 ELSE 0 END").cast("long").alias(
            "counted"
        ),
        F.expr(
            f"CASE WHEN {ok} THEN CAST(round(1e6 * CAST(a AS DOUBLE)"
            " * CAST(d AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("r_micro"),
        F.expr(
            f"CASE WHEN {ok} THEN CAST(round(1e6 * CAST(b AS DOUBLE)"
            " * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("s_micro"),
        F.expr(
            f"CASE WHEN {ok} THEN CAST(round(1e6 * (CAST(a AS DOUBLE)"
            " - CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)"
            " / CAST(n AS DOUBLE))) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("oe_micro"),
        F.expr(
            f"CASE WHEN {ok} THEN CAST(round(1e6 * (CAST(a + b AS DOUBLE)"
            " * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE)"
            " * CAST(b + d AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
            " * CAST(n - 1 AS DOUBLE)))) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("v_micro"),
    )
    agg = contrib.agg(
        F.sum("counted").cast("long").alias("n_strata"),
        F.sum("r_micro").cast("long").alias("sum_r_micro"),
        F.sum("s_micro").cast("long").alias("sum_s_micro"),
        F.sum("oe_micro").cast("long").alias("sum_oe_micro"),
        F.sum("v_micro").cast("long").alias("sum_v_micro"),
    )
    z = (
        "(CAST(sum_oe_micro AS DOUBLE)"
        " / (1000.0 * sqrt(CAST(sum_v_micro AS DOUBLE))))"
    )
    return agg.select(
        "n_strata",
        "sum_r_micro",
        "sum_s_micro",
        F.expr(
            "CASE WHEN sum_s_micro > 0 THEN "
            "round(CAST(sum_r_micro AS DOUBLE)"
            " / CAST(sum_s_micro AS DOUBLE), 6) END"
        ).alias("or_mh"),
        "sum_oe_micro",
        "sum_v_micro",
        F.expr(
            f"CASE WHEN sum_v_micro > 0 THEN round({z}, 6) END"
        ).alias("z"),
        F.expr(
            f"CASE WHEN sum_v_micro > 0 THEN {p_two_sided_ppm_sql(z)} END"
        ).alias("p_ppm"),
    )
