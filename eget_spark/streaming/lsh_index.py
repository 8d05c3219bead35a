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

State layout: two append-only parquet dirs (``index/``, ``matches/``)
under ``state_dir``; appends are idempotent per epoch via the streaming
checkpoint.  An Iceberg table is the production form (plans/tables.py
catalog gate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import lsh_bucket_table, lsh_probe


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
    index_dir = os.path.join(state_dir, "index")
    matches_dir = os.path.join(state_dir, "matches")

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        buckets = lsh_bucket_table(
            batch_df, id_col, text_col, num_hashes, bands, k
        ).persist()
        # within-batch: lower id plays the "already indexed" role so the
        # unordered pair set matches minhash_lsh_pairs exactly
        within = lsh_probe(
            buckets, buckets.select("id", "band", "sig")
        ).where(F.col("new_id") > F.col("index_id"))
        out = within
        if os.path.isdir(index_dir):
            out = out.unionByName(lsh_probe(buckets, spark.read.parquet(index_dir)))
        # matches write (an action) runs BEFORE the index append, so the
        # probe never sees this batch's own bucket rows via the index
        out.write.mode("append").parquet(matches_dir)
        buckets.write.mode("append").parquet(index_dir)
        buckets.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
