"""Streaming continuous-aggregate maintenance: the operators/rollup.py
merge identity driven by Structured Streaming micro-batches.

Each micro-batch IS a delta, and because rollup partials are restricted
to mergeable aggregates (rollup.py), ``foreachBatch`` folding batches
into a versioned state table yields EXACTLY the batch rollup of
everything seen — the streaming face of the TimescaleDB
continuous-aggregate refresh, with the stream==batch equality pinned by
test (the repo-wide streaming discipline, cf. streaming/seen.py).

State is a versioned parquet directory (``v<epoch>`` per refresh,
latest wins) so a refresh never reads and overwrites the same files —
the poor man's snapshot table; an Iceberg MERGE target is the
production form (plans/tables.py catalog gate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.rollup import merge_rollups, rollup_events


def _latest_version(state_dir: str, before_epoch: int | None = None) -> str | None:
    """Latest committed refresh; ``before_epoch`` restricts to versions
    older than the given epoch — a replayed micro-batch must merge onto
    the state as it was BEFORE its own (possibly half-written) refresh,
    or the batch double-counts into itself."""
    if not os.path.isdir(state_dir):
        return None
    vs = [
        d
        for d in os.listdir(state_dir)
        if d.startswith("v")
        and (before_epoch is None or int(d[1:]) < before_epoch)
    ]
    if not vs:
        return None
    return os.path.join(state_dir, max(vs, key=lambda s: int(s[1:])))


def read_rollup(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current rollup table (latest refresh)."""
    latest = _latest_version(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no rollup state under {state_dir}")
    return spark.read.parquet(latest)


def process_rollup_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    width_us: int = 3_600_000_000,
) -> None:
    """One refresh — module-level so the idempotency contract (same
    epoch replayed == same state) is directly testable.  Merges onto the
    newest version OLDER than this epoch: a checkpoint replay of epoch e
    rebuilds v<e> from the same prior state instead of merging the delta
    into its own earlier (possibly partial) write, which would
    double-count the batch."""
    spark = batch_df.sparkSession
    part = rollup_events(batch_df, key_col, ts_col, value_col, width_us)
    latest = _latest_version(state_dir, before_epoch=int(epoch_id))
    if latest is not None:
        part = merge_rollups(spark.read.parquet(latest), part)
    part.write.mode("overwrite").parquet(os.path.join(state_dir, f"v{epoch_id}"))


def rollup_stream(
    events_stream: DataFrame,
    state_dir: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    width_us: int = 3_600_000_000,
):
    """Start a foreachBatch query maintaining the rollup under
    ``state_dir``.  Use trigger(availableNow) + awaitTermination for the
    drain-everything batch-equivalent mode."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_rollup_batch(
            batch_df, epoch_id, state_dir, key_col, ts_col, value_col, width_us
        )

    return (
        events_stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
