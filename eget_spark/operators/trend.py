"""Robust per-host trend tests: Mann-Kendall S + Theil-Sen slope.

q254's CUSUM catches step changes; the complementary question is
monotone drift — a host getting steadily slower, a source whose page
sizes creep up.  The robust standard pair is the Mann-Kendall trend
statistic (Mann, Econometrica 1945; Kendall 1975)

    S = sum_{i<j} sign(x_j - x_i)

and the Theil-Sen slope estimator (Theil 1950; Sen, JASA 1968) — the
median of all pairwise slopes — which tolerates up to ~29% outliers
where least squares (the q191/q196/q238/q239 OLS fitters) breaks.

Pinned semantics (bit-exact across engines):

- per key, only the FIRST ``max_points`` observations by ts enter the
  test (pinned contract, not best-effort: the pair set is quadratic, so
  an unbounded hot key would put cap-free O(n^2) rows through one
  reducer; cap^2/2 bounds every key's fan-out)
- ts is unique per key (crawl ledgers are per-(host, fetch-time) unique)
- slope_ppm = (v_j - v_i) * 1_000_000 DIV (t_j - t_i) — exact int64,
  truncation toward zero in both engines
- the median is returned DOUBLED (``sen_x2_ppm`` = lower middle + upper
  middle of the slope order, equal when n_pairs is odd) so it stays an
  exact integer — no halving division
- mk_s is the exact integer sign sum; ``trend`` is its sign rendered
  'up' / 'down' / 'flat' (significance thresholds are the caller's
  policy — S and n_pairs carry everything needed)
- keys with a single point emit (n_pairs=0, mk_s=0, sen NULL, 'flat')

Scale shape (100 TB): the cap window and the pair self-join both hash
on key; per-key work is bounded by cap^2/2 pairs regardless of ledger
size, so the hottest host costs the same as any other — skew-proof by
construction.  The median comes from ONE ranking window over the pair
table plus two conditional sums in the same groupBy.  No Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trend_tests(
    series: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts",
    value_col: str = "value",
    max_points: int = 40,
) -> DataFrame:
    """(key, n_points, n_pairs, mk_s, sen_x2_ppm, trend) per key."""
    w_cap = Window.partitionBy(key_col).orderBy(ts_col)
    capped = (
        series.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).cast("long").alias("t"),
            F.col(value_col).cast("long").alias("v"),
        )
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("key").orderBy("t")
        ))
        .where(F.col("rn") <= max_points)
        .drop("rn")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.key") == F.col("b.key")) & (F.col("a.t") < F.col("b.t")),
    ).select(
        F.col("a.key").alias("key"),
        F.col("a.t").alias("ti"),
        F.col("b.t").alias("tj"),
        F.signum((F.col("b.v") - F.col("a.v")).cast("double"))
        .cast("long")
        .alias("sgn"),
        F.expr("(b.v - a.v) * CAST(1000000 AS BIGINT) DIV (b.t - a.t)")
        .alias("slope_ppm"),
    )
    w_rank = Window.partitionBy("key").orderBy("slope_ppm", "ti", "tj")
    w_all = Window.partitionBy("key")
    ranked = pairs.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "np", F.count("*").over(w_all)
    )
    lo = F.expr("(np + 1) DIV 2")
    hi = F.expr("(np + 2) DIV 2")
    pair_stats = ranked.groupBy("key").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("sgn").cast("long").alias("mk_s"),
        (
            F.sum(F.when(F.col("rn") == lo, F.col("slope_ppm")))
            + F.sum(F.when(F.col("rn") == hi, F.col("slope_ppm")))
        )
        .cast("long")
        .alias("sen_x2_ppm"),
    )
    points = capped.groupBy("key").agg(
        F.count("*").cast("long").alias("n_points")
    )
    return (
        points.join(pair_stats, "key", "left")
        .select(
            "key",
            "n_points",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("mk_s", F.lit(0)).cast("long").alias("mk_s"),
            "sen_x2_ppm",
            F.when(F.coalesce("mk_s", F.lit(0)) > 0, F.lit("up"))
            .when(F.coalesce("mk_s", F.lit(0)) < 0, F.lit("down"))
            .otherwise(F.lit("flat"))
            .alias("trend"),
        )
        .orderBy("key")
    )
