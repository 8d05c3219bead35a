"""Streaming incremental near-dup detection: the operators/dedup.py
MinHash-LSH bucket index maintained by Structured Streaming
micro-batches.

Each arriving micro-batch of documents (1) shingles and hashes ONCE into
its LSH bucket rows, (2) probes the stored index for cross-batch
near-dup matches, (3) self-joins its own buckets for within-batch
matches against lower-id documents, and (4) appends its bucket rows to
the index.  Only the batch is ever re-shingled — cost O(batch), never
O(corpus) — which is the whole point of keeping the index as state
between crawl rounds.

Stream==batch discipline (the repo-wide pin, cf. streaming/rollup.py):
after draining, (a) the index table equals ``lsh_bucket_table`` of every
document seen, and (b) the UNORDERED pair set in the matches table
equals full-corpus ``minhash_lsh_pairs`` — every colliding pair is
reported exactly once, either within its batch (new_id = higher id) or
when its later member arrives (new_id = the later document).  Pinned by
test.

State layout: per-epoch parquet subdirs (``index/e<epoch>``,
``matches/e<epoch>``) written with OVERWRITE — a mid-epoch crash that
replays the micro-batch rewrites its own epoch dir instead of appending
a duplicate, so the drained state is exactly-once regardless of where
the failure landed (the rollup.py versioned-state discipline).  Read
the union via ``read_lsh_index`` / ``read_lsh_matches``.  An Iceberg
table is the production form (plans/tables.py catalog gate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import lsh_bucket_table, lsh_probe


def _epoch_dirs(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d) for d in os.listdir(root) if d.startswith("e")
    )


def read_lsh_index(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current (id, band, sig) index — union of all committed epochs."""
    dirs = _epoch_dirs(os.path.join(state_dir, "index"))
    if not dirs:
        raise FileNotFoundError(f"no index state under {state_dir}")
    return spark.read.parquet(*dirs)


def read_lsh_matches(spark: SparkSession, state_dir: str) -> DataFrame:
    """All (new_id, index_id, band) match rows emitted so far."""
    dirs = _epoch_dirs(os.path.join(state_dir, "matches"))
    if not dirs:
        raise FileNotFoundError(f"no matches under {state_dir}")
    return spark.read.parquet(*dirs)


def process_lsh_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> None:
    """One micro-batch of the maintainer — module-level so the
    idempotency contract (same epoch replayed == no state change) is
    directly testable.  Probes only PRIOR epochs and OVERWRITES its own
    epoch dirs, so a replay after a mid-epoch crash rewrites rather than
    duplicates."""
    spark = batch_df.sparkSession
    index_dir = os.path.join(state_dir, "index")
    matches_dir = os.path.join(state_dir, "matches")
    buckets = lsh_bucket_table(
        batch_df, id_col, text_col, num_hashes, bands, k
    ).persist()
    # within-batch: lower id plays the "already indexed" role so the
    # unordered pair set matches minhash_lsh_pairs exactly
    within = lsh_probe(
        buckets, buckets.select("id", "band", "sig")
    ).where(F.col("new_id") > F.col("index_id"))
    out = within
    prior = [
        d
        for d in _epoch_dirs(index_dir)
        if d != os.path.join(index_dir, f"e{epoch_id}")
    ]
    if prior:
        out = out.unionByName(lsh_probe(buckets, spark.read.parquet(*prior)))
    out.write.mode("overwrite").parquet(os.path.join(matches_dir, f"e{epoch_id}"))
    buckets.write.mode("overwrite").parquet(os.path.join(index_dir, f"e{epoch_id}"))
    buckets.unpersist()


def lsh_index_stream(
    docs_stream: DataFrame,
    state_dir: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
):
    """Start a foreachBatch query maintaining the LSH index under
    ``state_dir`` and emitting (new_id, index_id, band) match rows.
    Use trigger(availableNow) + awaitTermination to drain."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_lsh_batch(
            batch_df, epoch_id, state_dir, id_col, text_col,
            num_hashes, bands, k,
        )

    return (
        docs_stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
