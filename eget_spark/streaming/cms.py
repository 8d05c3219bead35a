"""Streaming incremental count-min sketch: operators/cms.build_cms kept
up to date by Structured Streaming micro-batches.

CMS cells are ADDITIVE counters (Cormode & Muthukrishnan 2005 §4.1:
sketches of disjoint streams merge by cell-wise addition), so the live
form of "is this host suddenly hot?" needs no re-scan: each micro-batch
writes its own <=depth*width-row cell delta (cost O(batch), state
O(depth*width) per epoch no matter how many distinct keys the batch
carries), the drained state is a cell-wise SUM over epochs, and probing
the drained sketch through the batch operator's own estimation half
(operators/cms.cms_probe_estimates — split out for exactly this) yields
estimates BIT-EQUAL to probing ``build_cms`` over the union of all
batches under ANY arrival order — int64 sums commute.  Pinned by test.

Replay safety is the house per-epoch OVERWRITE discipline (shared with
rollup.py / novelty.py / boilerplate.py / hostgraph.py / revisits.py /
changerate.py / hll_distinct.py): a crash-replayed epoch overwrites its
own directory, so drained totals count it once.  Unlike the HLL
maintainer the cells are additive, NOT idempotent under re-observation —
a row duplicated across DIFFERENT epochs counts twice, exactly as it
would in batch build_cms over a corpus containing the duplicate (CMS
counts observations, not identities).

Scale shape: the per-batch delta and the drain are ONE map-side-combined
(j, bucket) sum each over a grid of fixed size; state is
O(epochs * depth * width) rows of int64 — the frontier's hot-host
detector costs kilobytes however large the crawl.  No window, no join
on the big side, no Python anywhere.
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


def process_cms_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> None:
    """One micro-batch: sketch ONLY the batch's rows to a cell delta and
    write this epoch's rows.  Module-level so replay idempotency is
    directly testable."""
    from ..operators.cms import build_cms

    delta = build_cms(batch_df, key_col, depth=depth, width=width)
    delta.write.mode("overwrite").parquet(
        os.path.join(state_dir, "cells", f"e{epoch_id}")
    )


def read_cms_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """(j, bucket, c) — the merged sketch implied by all drained epochs
    (cell-wise sum)."""
    dirs = _epoch_dirs(os.path.join(state_dir, "cells"))
    if not dirs:
        raise FileNotFoundError(f"no CMS state under {state_dir}")
    return (
        spark.read.parquet(*dirs)
        .groupBy("j", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def read_cms_estimates(
    spark: SparkSession,
    state_dir: str,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(key, cms_n) for the given probe keys — drained state through the
    batch operator's own estimation arithmetic (bit-equal to probing the
    batch sketch over the union of all batches)."""
    from ..operators.cms import cms_probe_estimates

    return cms_probe_estimates(
        read_cms_sketch(spark, state_dir), keys, key_col, depth=depth,
        width=width,
    )


def cms_stream(
    stream: DataFrame,
    state_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 64,
):
    """Start a foreachBatch query maintaining the cell deltas under
    ``state_dir``.  trigger(availableNow) + awaitTermination drains;
    :func:`read_cms_estimates` probes the live sketch."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_cms_batch(batch_df, epoch_id, state_dir, key_col, depth, width)

    return (
        stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
