"""Streaming incremental WARC revisit ledger: sources/warc.revisit_dedup
kept up to date by Structured Streaming micro-batches.

The revisit decision for a capture needs exactly one fact — the EARLIEST
fetch time of its (url, payload-digest) pair — and MIN is a commutative,
idempotent-mergeable aggregate.  So the maintainer never stores captures:
each micro-batch writes one ledger delta per (url, digest) it saw —
``(url, digest, first_time, n_captures, payload_bytes)`` — at cost
O(batch), never O(archive), and the drained ledger is a merge over
deltas (MIN of first_time, SUM of n_captures; payload_bytes is a
function of the digest so any delta's value is THE value, merged with
MAX for determinism).  Because MIN/SUM/MAX commute, the drained ledger
equals the batch ledger over the union of all batches under ANY arrival
order (the hostgraph.py contract) — and joining the full capture set
back against the drained ledger reproduces batch ``revisit_dedup``
BIT-IDENTICALLY (same record_type / refers_to / stored_bytes per
capture), both pinned by test.

This is the streaming face the reference's cache cannot express: its
Redis layer (/root/reference/services/cache/cache_service.py) keeps one
lossy per-URL copy with a TTL, so a recrawl OVERWRITES history; the
ledger keeps every capture's identity at revisit-record storage cost and
is maintainable from the live fetch stream.

State layout (the versioned-state discipline shared with rollup.py /
novelty.py / boilerplate.py / hostgraph.py): per-epoch parquet subdirs
``ledger/e<epoch>`` written with OVERWRITE — a replayed micro-batch
rewrites its own epoch dir, so drained state is exactly-once regardless
of where a crash landed.

Scale shape: the per-batch delta is ONE map-side-combined aggregate on
(url, digest) (politeness-bounded key width — at most one host's recrawl
cadence per URL); the drain is ONE merge aggregate over deltas, state
size O(distinct (url, digest)), never O(captures).  Digesting is JVM
``sha2`` inside codegen — no Python anywhere.
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


def ledger_delta(
    batch_df: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    time_col: str = "fetch_time",
) -> DataFrame:
    """One batch's (url, digest) ledger rows — the same digest/length
    derivation as sources/warc.revisit_dedup, then a map-side-combined
    MIN/COUNT/MAX aggregate."""
    return (
        batch_df.select(
            F.col(url_col).alias("url"),
            F.col(time_col).cast("long").alias("fetch_time"),
            F.sha2(F.col(payload_col), 256).alias("digest"),
            F.octet_length(F.col(payload_col)).cast("long").alias("_plen"),
        )
        .groupBy("url", "digest")
        .agg(
            F.min("fetch_time").alias("first_time"),
            F.count(F.lit(1)).cast("long").alias("n_captures"),
            F.max("_plen").alias("payload_bytes"),
        )
    )


def process_revisit_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    url_col: str = "url",
    payload_col: str = "payload",
    time_col: str = "fetch_time",
) -> None:
    """One micro-batch: aggregate ONLY the batch's captures to ledger
    deltas and write this epoch's rows.  Module-level so replay
    idempotency is directly testable."""
    delta = ledger_delta(batch_df, url_col, payload_col, time_col)
    delta.write.mode("overwrite").parquet(
        os.path.join(state_dir, "ledger", f"e{epoch_id}")
    )


def read_revisit_ledger(spark: SparkSession, state_dir: str) -> DataFrame:
    """(url, digest, first_time, n_captures, payload_bytes, saved_bytes)
    — the dedup ledger implied by all drained epochs; equals the batch
    ledger on the union of the batches.  ``saved_bytes`` is the archive
    storage the revisit records avoided: (n_captures - 1) * payload."""
    dirs = _epoch_dirs(os.path.join(state_dir, "ledger"))
    if not dirs:
        raise FileNotFoundError(f"no revisit-ledger state under {state_dir}")
    return merge_ledger_deltas(spark.read.parquet(*dirs))


def merge_ledger_deltas(deltas: DataFrame) -> DataFrame:
    """Merge any union of per-epoch ledger deltas into the ledger —
    MIN/SUM/MAX are commutative and associative, so the result is
    independent of how captures were split into epochs (the stream==batch
    identity, exercised in batch form by entry query q199)."""
    return (
        deltas.groupBy("url", "digest")
        .agg(
            F.min("first_time").alias("first_time"),
            F.sum("n_captures").cast("long").alias("n_captures"),
            F.max("payload_bytes").alias("payload_bytes"),
        )
        .withColumn(
            "saved_bytes",
            ((F.col("n_captures") - F.lit(1)) * F.col("payload_bytes")).cast(
                "long"
            ),
        )
    )


def assign_from_ledger(
    captures: DataFrame,
    ledger: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    time_col: str = "fetch_time",
) -> DataFrame:
    """Reproduce sources/warc.revisit_dedup's per-capture output from the
    drained ledger: an equi hash join on (url, digest) replaces the
    window — a capture is the original iff its fetch_time equals the
    ledger's first_time.  Bit-identical to the batch operator over the
    same captures (pinned by test).  The digest key is NULL-SAFE
    (``<=>``): a failed fetch's NULL payload digests to NULL, which the
    batch window groups as its own partition — a plain equi join would
    silently drop those captures (still a hash join; Spark plans
    EqualNullSafe keys as BroadcastHashJoin/SortMergeJoin)."""
    base = captures.select(
        F.col(url_col).alias("url"),
        F.col(time_col).cast("long").alias("fetch_time"),
        F.sha2(F.col(payload_col), 256).alias("digest"),
        F.octet_length(F.col(payload_col)).cast("long").alias("_plen"),
    )
    led = ledger.select(
        F.col("url").alias("_lurl"),
        F.col("digest").alias("_ldig"),
        "first_time",
    )
    is_orig = F.col("fetch_time") == F.col("first_time")
    cond = (F.col("url") == F.col("_lurl")) & F.col("digest").eqNullSafe(
        F.col("_ldig")
    )
    return base.join(led, cond, "inner").select(
        "url",
        "fetch_time",
        "digest",
        F.when(is_orig, F.lit("response"))
        .otherwise(F.lit("revisit"))
        .alias("record_type"),
        F.when(~is_orig, F.col("first_time")).cast("long").alias("refers_to"),
        F.when(is_orig, F.col("_plen"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("stored_bytes"),
    )


def revisit_stream(
    captures_stream: DataFrame,
    state_dir: str,
    url_col: str = "url",
    payload_col: str = "payload",
    time_col: str = "fetch_time",
):
    """Start a foreachBatch query maintaining the ledger deltas under
    ``state_dir``.  trigger(availableNow) + awaitTermination drains;
    :func:`read_revisit_ledger` materializes the ledger for storage
    accounting, :func:`assign_from_ledger` re-derives record types."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_revisit_batch(
            batch_df, epoch_id, state_dir, url_col, payload_col, time_col
        )

    return (
        captures_stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
