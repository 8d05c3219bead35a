"""Streaming incremental change-rate maintainer: operators/recrawl.
estimate_change_rate kept up to date by Structured Streaming
micro-batches of crawl check logs.

The Cho & Garcia-Molina improved estimator needs exactly two facts per
page — how many times it was checked (n) and how many checks observed a
change (X) — and both are ADDITIVE counters.  So each micro-batch writes
one (id, n_obs, n_changed) delta row per page it checked (cost O(batch),
state O(pages), never O(check log)), the drained counters are a SUM over
epochs, and feeding them through the batch operator's own arithmetic
(operators/recrawl.change_rates_from_counts — the shared expression
tree) yields rates BIT-EQUAL to ``estimate_change_rate`` over the union
of all batches under ANY arrival order (addition commutes; the
boilerplate.py/hostgraph.py contract).  Pinned by test.

This closes the recrawl loop as a live pipeline: the reference refetches
on a fixed 24 h TTL (/root/reference/services/cache/cache_service.py);
here every completed fetch round streams its change observations in and
the per-page refresh cadence (q187's output) updates continuously.

State layout (the versioned-state discipline shared with rollup.py /
novelty.py / boilerplate.py / hostgraph.py / revisits.py): per-epoch
parquet subdirs ``counts/e<epoch>`` written with OVERWRITE — a replayed
micro-batch rewrites its own epoch dir, so drained state is exactly-once
regardless of where a crash landed.

Scale shape: the per-batch delta and the drain merge are ONE
map-side-combined aggregate each, keyed on the uniform page id — no
window, no join, no Python anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _epoch_dirs(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d) for d in os.listdir(root) if d.startswith("e")
    )


def process_changerate_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    id_col: str = "url",
    changed_col: str = "changed",
) -> None:
    """One micro-batch: aggregate ONLY the batch's checks to counter
    deltas and write this epoch's rows.  Module-level so replay
    idempotency is directly testable."""
    delta = batch_df.groupBy(F.col(id_col).alias("id")).agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum(F.col(changed_col).cast("long")).cast("long").alias(
            "n_changed"
        ),
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(state_dir, "counts", f"e{epoch_id}")
    )


def read_change_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """(id, n_obs, n_changed) — the check counters implied by all drained
    epochs; equals the batch aggregate on the union of the batches."""
    dirs = _epoch_dirs(os.path.join(state_dir, "counts"))
    if not dirs:
        raise FileNotFoundError(f"no change-rate state under {state_dir}")
    return (
        spark.read.parquet(*dirs)
        .groupBy("id")
        .agg(
            F.sum("n_obs").cast("long").alias("n_obs"),
            F.sum("n_changed").cast("long").alias("n_changed"),
        )
    )


def read_change_rates(
    spark: SparkSession,
    state_dir: str,
    interval_sec: float = 86400.0,
    min_interval_sec: int = 3600,
    max_interval_sec: int = 604800,
) -> DataFrame:
    """The q187 output — (id, n_obs, n_changed, rate_per_day,
    next_interval_sec) — from the drained counters, through the batch
    operator's own expression tree (bit-equal to estimate_change_rate
    over the union of all batches)."""
    from ..operators.recrawl import change_rates_from_counts

    return change_rates_from_counts(
        read_change_counts(spark, state_dir),
        interval_sec,
        min_interval_sec,
        max_interval_sec,
    )


def changerate_stream(
    checks_stream: DataFrame,
    state_dir: str,
    id_col: str = "url",
    changed_col: str = "changed",
):
    """Start a foreachBatch query maintaining the counter deltas under
    ``state_dir``.  trigger(availableNow) + awaitTermination drains;
    :func:`read_change_rates` materializes the live refresh cadences."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_changerate_batch(
            batch_df, epoch_id, state_dir, id_col, changed_col
        )

    return (
        checks_stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
