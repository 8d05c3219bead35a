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
