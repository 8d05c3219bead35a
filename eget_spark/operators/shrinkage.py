"""Empirical-Bayes beta-binomial shrinkage of per-host rates.

A fleet estimates a success/failure/quality rate for EVERY host, and
most hosts have tiny samples: a 3/3 host is not a 100% host.  q278's
Wilson interval quantifies that uncertainty host by host; empirical
Bayes (Efron & Morris JASA 1975 — the baseball-averages estimator)
goes further and POOLS the fleet: fit a Beta(alpha, beta) prior to the
observed rate spread by method of moments, then replace each host's
raw rate x/n with the posterior mean

    shrunk = (x + alpha) / (n + alpha + beta)

— small-n hosts get pulled toward the fleet mean, large-n hosts barely
move.  This is the estimator a recrawl scheduler should rank small
hosts by (raw rates make 1/1 hosts beat 99/100 hosts); the shrinkage
companion to q278 (uncertainty), q285 (testing), and q251 (UCB
exploration).

Pinned semantics:
- per-key ``raw_ppm = x * 1e6 DIV n`` exact int64;
- prior moments over the KEY table use MILLI-quantized rates
  (``p_milli = x * 1000 DIV n``, exact): ``sum_p`` / ``sum_p2`` are
  exact int64 for fleets up to ~9e12 keys (ppm second moments would
  overflow at 1e7 keys — the reason for milli here);
- the moment combination ``varnum = K*sum_p2 - sum_p^2`` is formed in
  DOUBLE from those exact integers in pinned order (identical IEEE
  chain in every engine), and the Beta fit is the standard MoM:
  ``nu = m*(1000-m)/var - 1``, ``alpha = (m/1000)*nu``,
  ``beta = ((1000-m)/1000)*nu`` with m in milli;
- degenerate pins: zero rate variance -> every key shrinks exactly to
  the common mean; MoM failure (``nu <= 0``, spread too wide for any
  Beta — e.g. rates piled at 0 and 1) -> shrinkage is a no-op
  (``shrunk_ppm = raw_ppm``) and the prior columns are NULL.

Scale shape (100 TB): ONE map-side-combined groupBy(key) collapses the
ledger; the prior fit is a single-row agg over the key table,
broadcast back (1-row cross join); scoring is a pure projection.  No
windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shrink_sql() -> tuple[str, str, str]:
    """(shrunk_ppm, alpha_micro, beta_micro) SQL expressions over the
    columns (n, successes, raw_ppm, k, sum_p, sum_p2) — one shared
    text evaluated by Spark and the DuckDB oracle."""
    varnum = (
        "(CAST(k AS DOUBLE) * CAST(sum_p2 AS DOUBLE)"
        " - CAST(sum_p AS DOUBLE) * CAST(sum_p AS DOUBLE))"
    )
    m = "(CAST(sum_p AS DOUBLE) / CAST(k AS DOUBLE))"
    v = f"({varnum} / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)))"
    nu = f"(({m} * (1000.0 - {m})) / {v} - 1.0)"
    alpha = f"(({m} / 1000.0) * {nu})"
    beta = f"(((1000.0 - {m}) / 1000.0) * {nu})"
    shrunk = (
        f"CASE WHEN {varnum} = 0.0 THEN CAST(round(1000.0 * {m}) AS BIGINT) "
        f"WHEN {nu} <= 0.0 THEN raw_ppm "
        f"ELSE CAST(round(1e6 * (CAST(successes AS DOUBLE) + {alpha})"
        f" / (CAST(n AS DOUBLE) + {alpha} + {beta})) AS BIGINT) END"
    )
    a_out = (
        f"CASE WHEN {varnum} > 0.0 AND {nu} > 0.0 "
        f"THEN CAST(round(1e6 * {alpha}) AS BIGINT) END"
    )
    b_out = (
        f"CASE WHEN {varnum} > 0.0 AND {nu} > 0.0 "
        f"THEN CAST(round(1e6 * {beta}) AS BIGINT) END"
    )
    return shrunk, a_out, b_out


def shrink_from_counts(per_counts: DataFrame) -> DataFrame:
    """The prior fit + posterior scoring over an ALREADY-AGGREGATED
    (key, n, successes) table — factored out so the streaming health
    maintainer's drained additive counters flow through the identical
    arithmetic (stream==batch bit-equality by construction)."""
    per = per_counts.select(
        "*",
        F.expr(
            "successes * CAST(1000000 AS BIGINT) DIV n"
        ).alias("raw_ppm"),
        F.expr("successes * CAST(1000 AS BIGINT) DIV n").alias("_p_milli"),
    )
    moments = per.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("_p_milli").cast("long").alias("sum_p"),
        F.sum(F.col("_p_milli") * F.col("_p_milli")).cast("long").alias(
            "sum_p2"
        ),
    )
    shrunk, a_out, b_out = shrink_sql()
    return (
        per.crossJoin(F.broadcast(moments))
        .select(
            "key",
            "n",
            "successes",
            "raw_ppm",
            F.expr(shrunk).alias("shrunk_ppm"),
            F.expr(a_out).alias("prior_alpha_micro"),
            F.expr(b_out).alias("prior_beta_micro"),
        )
        .orderBy("key")
    )


def beta_binomial_shrink(
    ledger: DataFrame,
    key_col: str = "host",
    success_col: str = "success",
) -> DataFrame:
    """(key, n, successes, raw_ppm, shrunk_ppm, prior_alpha_micro,
    prior_beta_micro) per key, ordered by key — posterior-mean rates
    under the fleet-fitted Beta prior."""
    per = ledger.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(success_col).cast("long")).cast("long").alias(
            "successes"
        ),
    )
    return shrink_from_counts(per)
