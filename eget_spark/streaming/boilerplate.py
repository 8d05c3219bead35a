"""Streaming incremental boilerplate-template maintainer:
operators/boilerplate.py kept up to date by Structured Streaming
micro-batches.

Template detection (CCNet/RefinedWeb host-scoped rule — a line on >=
ceil(frac x host_pages) of a host's pages) is a pair of ADDITIVE counts:
per-(host, line) distinct-page occurrences and per-host page totals.
Each micro-batch therefore only lines-explodes ITSELF (cost O(batch),
never O(corpus)) and appends its count deltas; the template decision is
an aggregate over the drained deltas.  Because addition commutes, the
drained decision equals batch ``host_templates`` over the union of all
batches under ANY arrival order — a stronger stream==batch contract than
the id-ordered one streaming/novelty.py needs (pinned by test).

State layout (the rollup.py/novelty.py versioned-state discipline):
per-epoch parquet subdirs ``lines/e<epoch>`` and ``hosts/e<epoch>``
written with OVERWRITE — a replayed micro-batch rewrites its own epoch
dirs, so drained state is exactly-once regardless of where a crash
landed.

Assumes each page (host, id) arrives in EXACTLY ONE micro-batch (the
crawl's admission contract: a URL is admitted once); re-delivering a
page across DIFFERENT epochs would double-count it — that dedup belongs
to the upstream seen-filter, not this maintainer.
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


def process_boilerplate_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch: explode ONLY the batch's lines, write this
    epoch's (host, line, n_pages) and (host, host_pages) count deltas.
    Module-level so replay idempotency is directly testable."""
    from ..operators.boilerplate import exploded_lines

    lines = exploded_lines(batch_df, host_col, id_col, text_col)
    per_line = (
        lines.distinct()
        .groupBy("host", "line")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
    )
    hosts = batch_df.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("host_pages")
    )
    per_line.write.mode("overwrite").parquet(
        os.path.join(state_dir, "lines", f"e{epoch_id}")
    )
    hosts.write.mode("overwrite").parquet(
        os.path.join(state_dir, "hosts", f"e{epoch_id}")
    )


def read_templates(
    spark: SparkSession,
    state_dir: str,
    frac: float = 0.5,
    min_pages: int = 5,
    max_templates: int = 50,
) -> DataFrame:
    """(host, line, n_pages, host_pages) — the template table implied by
    all drained epochs; equals batch host_templates on the union."""
    line_dirs = _epoch_dirs(os.path.join(state_dir, "lines"))
    host_dirs = _epoch_dirs(os.path.join(state_dir, "hosts"))
    if not line_dirs or not host_dirs:
        raise FileNotFoundError(f"no boilerplate state under {state_dir}")
    per_line = (
        spark.read.parquet(*line_dirs)
        .groupBy("host", "line")
        .agg(F.sum("n_pages").cast("long").alias("n_pages"))
    )
    hosts = (
        spark.read.parquet(*host_dirs)
        .groupBy("host")
        .agg(F.sum("host_pages").cast("long").alias("host_pages"))
    )
    from ..operators.boilerplate import template_decision

    return template_decision(
        per_line, hosts, frac, min_pages, max_templates
    )


def boilerplate_stream(
    docs_stream: DataFrame,
    state_dir: str,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Start a foreachBatch query maintaining the count deltas under
    ``state_dir``.  Use trigger(availableNow) + awaitTermination to
    drain, then :func:`read_templates` for the decision table."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_boilerplate_batch(
            batch_df, epoch_id, state_dir, host_col, id_col, text_col
        )

    return (
        docs_stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
