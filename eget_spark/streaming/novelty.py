"""Streaming incremental n-gram novelty: operators/novelty.py maintained
by Structured Streaming micro-batches.

A crawl discovers documents round by round; the curation loop wants each
round's marginal-novelty scores (q143) WITHOUT re-shingling the whole
corpus — only the arriving batch shingles (cost O(batch)), probing a
persistent gram-first-seen state table for what earlier rounds already
contributed.  Same maintainer pattern as streaming/lsh_index.py.

Stream==batch discipline (the repo-wide pin): PROVIDED documents arrive
in non-decreasing id order across micro-batches — exactly what a crawl
feeding its admission-sequenced rounds guarantees — the drained scores
table equals batch ``ngram_novelty`` over the union of all batches, and
the drained gram state equals the batch first-seen table.  (Out-of-order
ids would let a later-arriving smaller id lose grams it would have won
in batch; the contract is pinned by test, not silently approximated.)

State layout: per-epoch parquet subdirs (``grams/e<epoch>``,
``scores/e<epoch>``) written with OVERWRITE — a replayed micro-batch
rewrites its own epoch dirs instead of appending duplicates, so drained
state is exactly-once regardless of where a crash landed (the rollup.py
versioned-state discipline).  The gram state grows only by each batch's
genuinely-new grams.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.novelty import doc_grams


def _epoch_dirs(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d) for d in os.listdir(root) if d.startswith("e")
    )


def read_novelty_scores(spark: SparkSession, state_dir: str) -> DataFrame:
    """(id, n_grams, n_novel, novelty_permille) rows emitted so far."""
    dirs = _epoch_dirs(os.path.join(state_dir, "scores"))
    if not dirs:
        raise FileNotFoundError(f"no scores under {state_dir}")
    return spark.read.parquet(*dirs)


def read_gram_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The (gram, first_id) first-seen table — union of committed epochs."""
    dirs = _epoch_dirs(os.path.join(state_dir, "grams"))
    if not dirs:
        raise FileNotFoundError(f"no gram state under {state_dir}")
    return spark.read.parquet(*dirs)


def process_novelty_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> None:
    """One micro-batch: shingle the batch ONCE, score it against prior
    state ∪ within-batch smaller ids, append only the genuinely-new
    grams.  Module-level so the idempotency contract (same epoch
    replayed == no state change) is directly testable."""
    spark = batch_df.sparkSession
    grams_dir = os.path.join(state_dir, "grams")
    scores_dir = os.path.join(state_dir, "scores")
    grams = doc_grams(batch_df, id_col, text_col, n).persist()
    first = grams.groupBy("gram").agg(F.min("id").alias("first_id"))
    prior = [
        d
        for d in _epoch_dirs(grams_dir)
        if d != os.path.join(grams_dir, f"e{epoch_id}")
    ]
    if prior:
        seen = spark.read.parquet(*prior).select("gram")
        fresh = first.join(seen, "gram", "left_anti")
    else:
        fresh = first
    scored = (
        grams.join(fresh, "gram", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("id") == F.col("first_id"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "id",
            "n_grams",
            "n_novel",
            F.expr("(1000 * n_novel) div n_grams").cast("long").alias(
                "novelty_permille"
            ),
        )
    )
    scored.write.mode("overwrite").parquet(
        os.path.join(scores_dir, f"e{epoch_id}")
    )
    fresh.write.mode("overwrite").parquet(
        os.path.join(grams_dir, f"e{epoch_id}")
    )
    grams.unpersist()


def novelty_stream(
    docs_stream: DataFrame,
    state_dir: str,
    id_col: str,
    text_col: str,
    n: int = 3,
):
    """Start a foreachBatch query maintaining the gram state under
    ``state_dir`` and emitting per-doc novelty scores.  Use
    trigger(availableNow) + awaitTermination to drain."""

    def each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_novelty_batch(
            batch_df, epoch_id, state_dir, id_col, text_col, n
        )

    return (
        docs_stream.writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
