"""Benford leading-digit audit over per-group numeric ledgers.

Naturally-grown size distributions (content lengths, byte counts, link
counts) spread across orders of magnitude and follow Benford's law
(Newcomb 1881; Benford 1938): P(leading digit = d) = log10(1 + 1/d).
Machine-generated or padded corpora don't — a spam network emitting
fixed-template pages, a mirror farm cloning one document size, or an
instrumented counter stuck in a narrow range all bend the first-digit
histogram.  Auditing per-source digit histograms against Benford is a
standard forensic screen (Nigrini's accounting forensics popularized
it); here it flags sources whose "organic" size profile isn't.

Pinned semantics (bit-exact across engines):

- only values > 0 participate; the leading digit is the first character
  of the decimal rendering (pure integer string op, no logs)
- the Benford expectation is the PINNED ppm table below — the nine
  round(log10(1+1/d) * 1e6) constants, which sum to exactly 1_000_000,
  so no engine ever computes a transcendental
- every (group, digit) cell is emitted, including obs = 0 (a missing
  digit is evidence, not absence of data) via a 9-row digit spine
- dev_micro = obs * 1_000_000 - n * exp_ppm  (exact int64; positive =
  over-represented digit)
- chi2_c = round(dev_micro^2 / (n * exp_ppm * 1e6), 6) — the digit's
  Pearson chi-square contribution, computed with ONE double division of
  exactly-derived integers (per-digit, never summed across rows in
  floating point; sum the column for the group statistic)

Scale shape (100 TB): digit extraction is a projection; the histogram
is a map-side-combined groupBy with <= 9 * |groups| keys (combine
absorbs all value skew); the spine is a 9-row broadcast against the
group-sized margin table; the obs join is group-digit-keyed and
group-sized.  No windows over raw data, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# round(log10(1 + 1/d) * 1e6) for d = 1..9 — sums to exactly 1_000_000
BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153,
               45757]


def benford_digit_audit(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """(grp, digit, n, obs, exp_ppm, dev_micro, chi2_c) — one row per
    group per digit 1..9, ordered (grp, digit)."""
    vals = df.where(F.col(value_col) > 0).select(
        F.col(group_col).alias("grp"),
        F.substring(F.col(value_col).cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("digit"),
    )
    obs = vals.groupBy("grp", "digit").agg(
        F.count("*").cast("long").alias("obs")
    )
    margins = vals.groupBy("grp").agg(F.count("*").cast("long").alias("n"))
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("long").alias("digit")
    )
    exp_ppm = F.element_at(
        F.array(*[F.lit(v).cast("long") for v in BENFORD_PPM]),
        F.col("digit").cast("int"),
    )
    grid = margins.crossJoin(F.broadcast(spine)).withColumn(
        "exp_ppm", exp_ppm
    )
    full = grid.join(obs, ["grp", "digit"], "left").withColumn(
        "obs", F.coalesce(F.col("obs"), F.lit(0)).cast("long")
    )
    dev = F.col("obs") * F.lit(1_000_000).cast("long") - F.col("n") * F.col(
        "exp_ppm"
    )
    return (
        full.withColumn("dev_micro", dev)
        .withColumn(
            "chi2_c",
            F.round(
                (
                    F.col("dev_micro").cast("double")
                    * F.col("dev_micro").cast("double")
                )
                / (
                    F.col("n").cast("double")
                    * F.col("exp_ppm").cast("double")
                    * 1e6
                ),
                6,
            ),
        )
        .select("grp", "digit", "n", "obs", "exp_ppm", "dev_micro", "chi2_c")
        .orderBy("grp", "digit")
    )


def contingency_gtest(
    df: DataFrame,
    row_col: str = "source",
    col_col: str = "label",
) -> DataFrame:
    """G-test of independence over an R x C contingency table (Sokal &
    Rohlf, Biometry; the log-likelihood-ratio sibling of Pearson's
    chi-square, additive across cells) — the corpus-bias audit "is
    quality tier independent of source", the table-level companion to
    q248's bigram-level Dunning G².

    Pinned semantics: cells/margins/total are exact int64 from three
    aggregates; per cell the ln ratio is quantized FIRST
    (``lr_micro = round(1e6 * ln((obs*N in DOUBLE)/(n_r*n_c in
    DOUBLE)))``) and the contribution is the exact integer product
    ``g_micro = 2 * obs * lr_micro`` (int64 envelope: obs * 1e6 * |ln|
    — exact to ~10^11 observations per cell); zero cells contribute 0
    (the G-test convention, lim x->0 x ln x = 0) and are not emitted.
    The table-level statistic is ``sum(g_micro)`` with dof =
    (R-1)(C-1), replicated on every row.

    Output: one row per non-empty cell (row, col, obs, exp_milli,
    g_micro, g_total_micro, dof) ordered (row, col); exp_milli =
    ``n_r * n_c * 1000 DIV N`` is the expected count in milli-units.

    Scale shape (100 TB): ONE map-side-combined groupBy to cells
    (<= R*C keys — combine absorbs all skew by construction), margins
    are groupBys OF the cell table, scalars ride 1-row broadcasts.  No
    windows, no Python."""
    cells = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count("*").cast("long").alias("obs"))
    rm = cells.groupBy("r").agg(F.sum("obs").cast("long").alias("n_r"))
    cm = cells.groupBy("c").agg(F.sum("obs").cast("long").alias("n_c"))
    tot = cells.agg(
        F.sum("obs").cast("long").alias("n"),
        F.count_distinct("r").cast("long").alias("nr"),
        F.count_distinct("c").cast("long").alias("nc"),
    )
    lr = F.round(
        F.log(
            (F.col("obs").cast("double") * F.col("n").cast("double"))
            / (F.col("n_r").cast("double") * F.col("n_c").cast("double"))
        )
        * 1e6
    ).cast("long")
    terms = (
        cells.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "c",
            "obs",
            F.expr("n_r * n_c * CAST(1000 AS BIGINT) DIV n").alias(
                "exp_milli"
            ),
            (2 * F.col("obs") * lr).cast("long").alias("g_micro"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias(
                "dof"
            ),
        )
    )
    total = terms.agg(
        F.sum("g_micro").cast("long").alias("g_total_micro")
    )
    return (
        terms.crossJoin(F.broadcast(total))
        .select("r", "c", "obs", "exp_milli", "g_micro", "g_total_micro",
                "dof")
        .orderBy("r", "c")
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity census over quasi-identifier tuples (Sweeney, IJUFKS
    2002): the privacy audit a dataset release runs AFTER q59's direct-
    identifier scrub — rows whose quasi-identifier combination (host,
    language, size bucket, ...) matches fewer than k others are
    re-identification risks and must be suppressed or generalized.

    Pinned semantics: equivalence classes = exact groupBy on the quasi
    columns; one summary row of exact int64 counts —

    (n_rows, n_classes, min_class, k_anonymity = min_class, n_classes_
    below_k, rows_below_k, suppress_ppm = rows_below_k * 1e6 DIV
    n_rows)

    Scale shape: ONE map-side-combined groupBy to class sizes, one
    aggregate OF the class table.  No windows, no joins, no Python."""
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count("*").cast("long").alias("sz")
    )
    return classes.agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.min("sz").cast("long").alias("k_anonymity"),
        F.sum((F.col("sz") < k).cast("long"))
        .cast("long")
        .alias("n_classes_below_k"),
        F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("rows_below_k"),
    ).select(
        "n_rows",
        "n_classes",
        "k_anonymity",
        "n_classes_below_k",
        "rows_below_k",
        F.expr("rows_below_k * CAST(1000000 AS BIGINT) DIV n_rows").alias(
            "suppress_ppm"
        ),
    )
