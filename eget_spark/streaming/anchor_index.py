"""Streaming incremental anchor-text index: the q215 anchor-BM25 corpus
kept up to date by Structured Streaming micro-batches of harvested
(target, anchor) link pairs.

Anchor pseudo-documents are BAGS of tokens, and bag counts are ADDITIVE:
each micro-batch writes one (target, tok, cnt) delta per key it saw
(cost O(batch); a hot homepage's 10^6 in-links in one batch collapse to
one row per distinct token), the drained state is a cell-wise SUM over
epochs, and scoring the drained counts through the batch operator's own
shared tail (operators/search._bm25_from_tf — the same function
anchor_bm25_topk ends in) yields rankings BIT-EQUAL to
``anchor_bm25_topk`` over the union of all batches under ANY arrival
order — int64 sums commute, and every float op after the counts is the
identical expression tree.  Pinned by test.

Replay safety is the house per-epoch OVERWRITE discipline (shared with
rollup.py / novelty.py / boilerplate.py / hostgraph.py / revisits.py /
changerate.py / hll_distinct.py / cms.py): a crash-replayed epoch
overwrites its own directory, so drained counts include it exactly once.

Scale shape: the per-batch delta explodes anchors to tokens and runs ONE
map-side-combined (target, tok) count; the drain is ONE map-side-combined
sum; state is O(distinct (target, tok)) rows.  Queries against the live
index reuse the batch scoring shape (1-row broadcast stats, TakeOrdered).
No window, no Python anywhere.
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


def process_anchor_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    target_col: str = "target",
    anchor_col: str = "anchor",
) -> None:
    """One micro-batch: tokenize ONLY the batch's anchors and write this
    epoch's (target, tok, cnt) delta rows.  Module-level so replay
    idempotency is directly testable."""
    from ..operators.search import _tok_arr

    delta = (
        batch_df.select(
            F.col(target_col).alias("target"),
            F.explode(_tok_arr(anchor_col)).alias("tok"),
        )
        .groupBy("target", "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(state_dir, "counts", f"e{epoch_id}")
    )


def read_anchor_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """(target, tok, cnt) — the merged bag counts implied by all drained
    epochs (cell-wise sum)."""
    dirs = _epoch_dirs(os.path.join(state_dir, "counts"))
    if not dirs:
        raise FileNotFoundError(f"no anchor-index state under {state_dir}")
    return (
        spark.read.parquet(*dirs)
        .groupBy("target", "tok")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def read_anchor_bm25(
    spark: SparkSession,
    state_dir: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Anchor-BM25 top-k over the LIVE index: drained counts through the
    batch operator's shared scoring tail — bit-equal to
    ``anchor_bm25_topk`` over the union of all batches."""
    from ..operators.search import _bm25_from_tf

    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    counts = read_anchor_counts(spark, state_dir)
    base = counts.groupBy("target").agg(
        F.sum("cnt").cast("long").alias("_dl"),
        *[
            F.sum(F.when(F.col("tok") == t, F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    return _bm25_from_tf(base, "target", terms, k=k, k1=k1, b=b)


def anchor_index_stream(
    stream: DataFrame,
    state_dir: str,
    target_col: str = "target",
    anchor_col: str = "anchor",
):
    """Start a foreachBatch query maintaining the (target, tok, cnt)
    deltas under ``state_dir``.  trigger(availableNow) + awaitTermination
    drains; :func:`read_anchor_bm25` queries the live index."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_anchor_batch(batch_df, epoch_id, state_dir, target_col,
                             anchor_col)

    return (
        stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
