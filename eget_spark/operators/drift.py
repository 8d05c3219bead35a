"""CUSUM drift detection over per-host metric series.

A crawl fleet watches per-host signals — fetch latency, error rate,
bytes/page — for sustained shifts: a host that got slow (throttling),
an error-rate step (ban), a page-size jump (template change, q82's
snapshot-diff complement at the metric level).  The classic sequential
detector is Page's CUSUM (Biometrika 1954):

    S_0 = 0;   S_n = max(0, S_{n-1} + (x_n - k))

with k the reference value (in-control mean plus slack); an alarm fires
when S_n >= h.  The recurrence looks inherently sequential, but it has
the textbook closed form (reflection at zero):

    S_n = cum_n - min(0, min_{j<=n} cum_j),   cum_j = sum_{i<=j}(x_i - k)

which is exactly two running windows — a cumulative sum and a running
minimum — so the whole detector is dataflow, no per-row recursion.

Pinned semantics (so the DuckDB oracle is bit-exact): values, k, and h
are int64; every S_n is an exact integer; rows order by ``ts`` within a
key and ``ts`` must be unique per key (the caller's contract — crawl
ledgers are per-(host, fetch-time) unique).  Output per key: point
count, the maximum CUSUM reached, the FIRST ts where the alarm
threshold was crossed (NULL if never), and the drift flag.

Scale shape (100 TB): ONE Window node computes both running frames over
the same (key ORDER BY ts) spec — a single hash shuffle on key; the
per-key summary groupBy reuses that partitioning (no second exchange).
State per key is O(1); skew equals the hottest host's ledger, which is
bounded by the politeness budget upstream.  No joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_drift(
    series: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = 0,
    h: int = 1,
) -> DataFrame:
    """(key, n, max_cusum, alarm_ts, drifted) per key — one-sided upward
    CUSUM with reference ``k`` and alarm threshold ``h``."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    adj = F.col(value_col).cast("long") - F.lit(int(k)).cast("long")
    # keep the ORIGINAL key/ts names through both window selects: an
    # alias between them breaks partitioning/ordering reuse and costs a
    # second (redundant) hash exchange on the full series
    cummed = series.select(
        F.col(key_col),
        F.col(ts_col),
        F.sum(adj).over(w).alias("cum"),
    )
    w2 = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = cummed.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        (
            F.col("cum")
            - F.least(F.min("cum").over(w2), F.lit(0).cast("long"))
        ).alias("s"),
    )
    return (
        stepped.groupBy("key")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max("s").cast("long").alias("max_cusum"),
            F.min(F.when(F.col("s") >= int(h), F.col("ts"))).alias(
                "alarm_ts"
            ),
        )
        .select(
            "key",
            "n",
            "max_cusum",
            "alarm_ts",
            (F.col("max_cusum") >= int(h)).alias("drifted"),
        )
    )
