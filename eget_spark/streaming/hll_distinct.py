"""Streaming incremental keyed-HLL distinct counter: operators/hll.
hll_estimate_by kept up to date by Structured Streaming micro-batches.

HyperLogLog registers are the textbook MERGEABLE sketch (union = max
per register; Flajolet et al. 2007 §4), so the live form of "distinct
URLs fetched per host" / "distinct referring hosts per target" needs no
re-scan: each micro-batch writes its own sparse (key, bucket, reg)
register deltas (cost O(batch), at most m occupied buckets per key no
matter how hot the key), the drained state is a register-wise MAX over
epochs, and running the drained registers through the batch operator's
own arithmetic half (operators/hll.hll_estimates_from_regs — extracted
for exactly this) yields estimates BIT-EQUAL to ``hll_estimate_by``
over the union of all batches under ANY arrival order (max commutes,
and the register construction is the engine-wide md5-60bit contract).
Pinned by test.

MAX-merge is also what makes replay safe TWICE over: the per-epoch
OVERWRITE discipline (shared with rollup.py / novelty.py /
boilerplate.py / hostgraph.py / revisits.py / changerate.py) makes a
replayed epoch exactly-once, and even a duplicated ROW across epochs
cannot change a max — the sketch is idempotent under re-observation,
unlike the additive maintainers.

Scale shape: the per-batch delta and the drain are ONE map-side-combined
(key, bucket) max each; state is O(sum of occupied buckets), capped at
m per key — skew-proof where count(DISTINCT) is not.  No window, no
join, no Python anywhere.
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


def process_hll_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    key_col: str,
    value_col: str,
    p: int = 8,
) -> None:
    """One micro-batch: sketch ONLY the batch's rows to sparse register
    deltas and write this epoch's rows.  Module-level so replay
    idempotency is directly testable."""
    from ..operators.hll import keyed_hll_regs

    delta = keyed_hll_regs(batch_df, key_col, F.col(value_col), p)
    delta.write.mode("overwrite").parquet(
        os.path.join(state_dir, "regs", f"e{epoch_id}")
    )


def read_hll_registers(spark: SparkSession, state_dir: str) -> DataFrame:
    """(key, bucket, reg) — the merged sparse registers implied by all
    drained epochs (register-wise max)."""
    dirs = _epoch_dirs(os.path.join(state_dir, "regs"))
    if not dirs:
        raise FileNotFoundError(f"no HLL state under {state_dir}")
    return (
        spark.read.parquet(*dirs)
        .groupBy("key", "bucket")
        .agg(F.max("reg").cast("int").alias("reg"))
    )


def read_hll_estimates(
    spark: SparkSession, state_dir: str, p: int = 8
) -> DataFrame:
    """The hll_estimate_by output — (key, m, v_zero, sum_scaled,
    estimate) — from the drained registers, through the batch operator's
    own arithmetic (bit-equal to batch over the union of all batches)."""
    from ..operators.hll import hll_estimates_from_regs

    return hll_estimates_from_regs(read_hll_registers(spark, state_dir), p)


def hll_distinct_stream(
    stream: DataFrame,
    state_dir: str,
    key_col: str,
    value_col: str,
    p: int = 8,
):
    """Start a foreachBatch query maintaining the register deltas under
    ``state_dir``.  trigger(availableNow) + awaitTermination drains;
    :func:`read_hll_estimates` materializes the live distinct counts."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_hll_batch(batch_df, epoch_id, state_dir, key_col, value_col, p)

    return (
        stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
