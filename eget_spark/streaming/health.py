"""Streaming incremental host-health counters: the q285 BH-FDR screen
and q289 empirical-Bayes shrinkage kept live by micro-batches.

Both inference operators consume ONLY per-host (n, successes/fails)
counters, and counters are ADDITIVE — sketches of disjoint streams
merge by summation — so the live form of "which hosts may I throttle
right now?" needs no ledger re-scan: each micro-batch writes its own
per-host counter delta (cost O(batch), state O(hosts) per epoch), the
drained state is a key-wise SUM over epochs, and pushing the drained
counters through the batch operators' own factored tails
(operators/fdr.fdr_from_counts, operators/shrinkage.
shrink_from_counts — split out for exactly this) yields results
BIT-EQUAL to running host_failure_fdr / beta_binomial_shrink over the
union of all batches under ANY arrival order: int64 sums commute, and
everything downstream of the counters is deterministic arithmetic.
Pinned by test.

Replay safety is the house per-epoch OVERWRITE discipline (shared with
cms.py / hll_distinct.py / changerate.py and the rest): a
crash-replayed epoch overwrites its own directory, so drained totals
count it once.  Like CMS the counters are additive, NOT
re-observation-idempotent — a fetch duplicated across DIFFERENT epochs
counts twice, exactly as it would in the batch ledger containing the
duplicate (health counters count fetch attempts, not identities) —
"DIFFERENT epochs" being the operative phrase: a replay of the SAME
epoch overwrites and counts once.

Scale shape: the per-batch delta and the drain are ONE
map-side-combined groupBy(host) each; state is O(epochs * hosts) rows
of three int64s.  The inference tails then operate on the HOST table
(the q285/q289 scale notes apply verbatim).  No window over data-sized
frames, no Python anywhere.
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


def process_health_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    host_col: str = "host",
    success_col: str = "success",
) -> None:
    """One micro-batch: aggregate ONLY the batch's fetches to a per-host
    counter delta and write this epoch's rows.  Module-level so replay
    idempotency is directly testable."""
    delta = batch_df.groupBy(F.col(host_col).alias("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(success_col).cast("long")).cast("long").alias(
            "successes"
        ),
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(state_dir, "counters", f"e{epoch_id}")
    )


def read_health_counters(spark: SparkSession, state_dir: str) -> DataFrame:
    """(key, n, successes) — the merged per-host counters implied by all
    drained epochs (key-wise sum)."""
    dirs = _epoch_dirs(os.path.join(state_dir, "counters"))
    if not dirs:
        raise FileNotFoundError(f"no health state under {state_dir}")
    return (
        spark.read.parquet(*dirs)
        .groupBy("key")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("successes").cast("long").alias("successes"),
        )
    )


def read_live_fdr(
    spark: SparkSession,
    state_dir: str,
    p0_ppm: int = 30_000,
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """Drained counters through the batch q285 tail — BIT-EQUAL to
    host_failure_fdr over the union of all batches."""
    from ..operators.fdr import fdr_from_counts

    per = read_health_counters(spark, state_dir).select(
        "key",
        "n",
        (F.col("n") - F.col("successes")).cast("long").alias("fails"),
    )
    return fdr_from_counts(per, p0_ppm, alpha_ppm)


def read_live_shrinkage(spark: SparkSession, state_dir: str) -> DataFrame:
    """Drained counters through the batch q289 tail — BIT-EQUAL to
    beta_binomial_shrink over the union of all batches."""
    from ..operators.shrinkage import shrink_from_counts

    return shrink_from_counts(read_health_counters(spark, state_dir))


def health_stream(
    stream: DataFrame,
    state_dir: str,
    host_col: str = "host",
    success_col: str = "success",
):
    """Start a foreachBatch query maintaining the counter deltas under
    ``state_dir``.  trigger(availableNow) + awaitTermination drains;
    :func:`read_live_fdr` / :func:`read_live_shrinkage` answer from the
    live state."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_health_batch(
            batch_df, epoch_id, state_dir, host_col, success_col
        )

    return (
        stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
