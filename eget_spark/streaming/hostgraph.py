"""Streaming incremental host-graph maintainer: operators/graph.
collapse_to_hosts kept up to date by Structured Streaming micro-batches.

The host graph (q177's rank/budget substrate) is an ADDITIVE aggregate —
(src_host, dst_host) -> count of page edges — so each crawl round's link
harvest can maintain it incrementally: a micro-batch collapses ONLY its
own page edges (cost O(batch), never O(graph)) and appends the weight
deltas; the drained graph is a sum over deltas.  Because addition
commutes, the drained table equals batch ``collapse_to_hosts`` over the
union of all batches under ANY arrival order (the boilerplate.py
contract, stronger than novelty.py's id-ordered one) — pinned by test,
as is the downstream equality: weighted PageRank over the drained graph
is BIT-IDENTICAL to rank over the batch-built graph, because the rank
only sees the summed weights.

State layout (the versioned-state discipline shared with rollup.py /
novelty.py / boilerplate.py): per-epoch parquet subdirs ``edges/e<epoch>``
written with OVERWRITE — a replayed micro-batch rewrites its own epoch
dir, so drained state is exactly-once regardless of where a crash landed.

Assumes each page edge arrives in exactly one micro-batch (the crawl's
admission contract — a page's links are harvested once, when it is
fetched); cross-epoch redelivery dedup belongs to the upstream seen
filter, not this maintainer.
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


def process_hostgraph_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    src_host_col: str = "src_host",
    dst_host_col: str = "dst_host",
) -> None:
    """One micro-batch: collapse ONLY the batch's page edges to host-pair
    weight deltas and write this epoch's rows.  Module-level so replay
    idempotency is directly testable."""
    from ..operators.graph import collapse_to_hosts

    delta = collapse_to_hosts(batch_df, src_host_col, dst_host_col)
    delta.write.mode("overwrite").parquet(
        os.path.join(state_dir, "edges", f"e{epoch_id}")
    )


def read_host_graph(spark: SparkSession, state_dir: str) -> DataFrame:
    """(src, dst, weight) — the host graph implied by all drained epochs;
    equals batch collapse_to_hosts on the union of the batches."""
    dirs = _epoch_dirs(os.path.join(state_dir, "edges"))
    if not dirs:
        raise FileNotFoundError(f"no host-graph state under {state_dir}")
    return (
        spark.read.parquet(*dirs)
        .groupBy("src", "dst")
        .agg(F.sum("weight").cast("long").alias("weight"))
    )


def hostgraph_stream(
    edges_stream: DataFrame,
    state_dir: str,
    src_host_col: str = "src_host",
    dst_host_col: str = "dst_host",
):
    """Start a foreachBatch query maintaining the weight deltas under
    ``state_dir``.  trigger(availableNow) + awaitTermination drains;
    :func:`read_host_graph` materializes the graph for rank/budget jobs."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_hostgraph_batch(
            batch_df, epoch_id, state_dir, src_host_col, dst_host_col
        )

    return (
        edges_stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
