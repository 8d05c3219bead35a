"""Exact per-key quantiles by integer rank arithmetic.

The corpus-QA staple (p50/p90/p99 of document length, fetch latency,
chunk size per source) — computed EXACTLY, with rank semantics pinned so
engines cannot disagree: approximate sketches (t-digest, GK,
percentile_approx) trade exactness for memory, and interpolating
definitions (quantile_cont) produce engine-specific floats.  Here
``q_p = the value at 1-based rank ceil(p * n)`` in ``(value, tiebreak)``
order — the lower inverse-distribution convention, all-integer
(``ceil(p*n) = (n*num + den - 1) // den`` for p = num/den), so the
result is a row VALUE from the data, never an interpolation.

Scale shape: ONE hash exchange on the key — the rank window and the
per-key aggregate share the partitioning (Catalyst reuses the
exchange), and the output is one row per key.  For 100-TB telemetry
where even one sort is too much, the engine's sketch tier
(operators/hll.py, cms.py, kmv.py) is the escape hatch; this operator
is the exact tier for key-partitioned data that fits a per-key sort —
the same split TimescaleDB/ClickHouse make (exact within partition,
sketch across).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    tiebreak_col: str,
    ps: tuple = (Fraction(1, 2), Fraction(9, 10), Fraction(99, 100)),
) -> DataFrame:
    """(key, n, q_<num>_<den>...) — one row per key, one column per
    requested quantile (exact fractions, e.g. Fraction(1,2) -> q_1_2).
    ``tiebreak_col`` pins the order of equal values."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(value_col), F.col(tiebreak_col)
    )
    wn = Window.partitionBy(key_col)
    # group on the UN-aliased window key: renaming it before the groupBy
    # makes Catalyst miss that the window's hash partitioning already
    # satisfies the aggregate, costing a second exchange
    ranked = df.select(
        F.col(key_col),
        F.col(value_col).alias("v"),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(wn).alias("_n"),
    )
    aggs = [F.max("_n").cast("long").alias("n")]
    for p in ps:
        fr = Fraction(p)
        num, den = fr.numerator, fr.denominator
        target = F.floor(
            (F.col("_n") * num + (den - 1)) / F.lit(den)
        ).cast("long")
        aggs.append(
            F.max(F.when(F.col("_rn") == target, F.col("v"))).alias(
                f"q_{num}_{den}"
            )
        )
    return ranked.groupBy(key_col).agg(*aggs).withColumnRenamed(key_col, "key")
