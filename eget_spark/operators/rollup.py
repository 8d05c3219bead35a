"""Time-bucketed rollups with mergeable partials — the hypertable /
continuous-aggregate pattern over the crawl's event log.

A 100-TB crawl emits an append-only event stream (fetches, errors,
bytes); dashboards read per-hour/per-type rollups, and recomputing them
from raw events on every refresh is the classic waste.  The public
pattern (TimescaleDB continuous aggregates, Druid rollup segments,
Iceberg MERGE-maintained summary tables) is: keep PARTIAL aggregates
per (bucket, key) — counts and sums, which are associative — and fold
new deltas in with a re-aggregation, never touching history.

Everything here is deliberately restricted to MERGEABLE aggregates
(count, sum, min, max): ``merge_rollups(rollup(prior), rollup(delta))
== rollup(prior ∪ delta)`` holds exactly, in integer/fixed-point
arithmetic, so the incremental path is provably equal to the batch path
(the q105 oracle checks precisely this identity).  Non-mergeable
metrics (exact distinct) ride as their own mergeable sketch
(operators/hll.py, operators/cms.py) — the same discipline at sketch
level.

Scale shape: rollup is ONE map-side-combined groupBy(bucket, key) —
partial rows per task are bounded by buckets x keys, not events;
merge_rollups is the same aggregate over the (tiny) union of partials.

Timestamps are bucketed in epoch microseconds via
``timestampdiff(MICROSECOND, TIMESTAMP_NTZ epoch, ts)`` — TIMESTAMP_NTZ
safe (Spark's unix_micros rejects NTZ) and bit-identical to DuckDB's
``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def time_bucket(ts_col: str, width_us: int) -> Column:
    """Epoch-micros floor bucket of a (NTZ) timestamp column."""
    us = F.expr(f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, {ts_col})")
    return (F.floor(us / F.lit(int(width_us))) * int(width_us)).cast("long")


def rollup_events(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    width_us: int = 3_600_000_000,
) -> DataFrame:
    """(bucket_us, key, n_events, sum_value_fp, min_value_fp,
    max_value_fp) — values pinned to 1e-6 fixed point so sums merge in
    exact int64 (the kmeans/pagerank recipe; float sums would not be
    associative and the merge identity would only hold approximately)."""
    v_fp = F.floor(
        F.col(value_col).cast("double") * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("long")
    return (
        events.select(
            time_bucket(ts_col, width_us).alias("bucket_us"),
            F.col(key_col).alias("key"),
            v_fp.alias("_v"),
        )
        .groupBy("bucket_us", "key")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("_v").alias("sum_value_fp"),
            F.min("_v").alias("min_value_fp"),
            F.max("_v").alias("max_value_fp"),
        )
    )


def merge_rollups(*parts: DataFrame) -> DataFrame:
    """Fold partial rollups into one — the continuous-aggregate refresh.
    Inputs must share the rollup_events schema; counts/sums add,
    min/max fold, exactly."""
    if not parts:
        raise ValueError("no rollups to merge")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("bucket_us", "key").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_value_fp").alias("sum_value_fp"),
        F.min("min_value_fp").alias("min_value_fp"),
        F.max("max_value_fp").alias("max_value_fp"),
    )
