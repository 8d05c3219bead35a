"""Training-sequence packing: fill fixed-token-capacity sequences with docs.

Training-data-pipeline extension (not a reference operator): LLM training
consumes fixed-length token sequences, and packing multiple short documents
into one sequence (instead of padding each to the context length) is the
standard throughput lever.  This operator assigns every document a
(shard, seq_no, offset) placement under NEXT-FIT packing:

- documents are SHARDED by ``id % n_shards`` — the parallelism unit; each
  shard packs independently, so the operator scales horizontally (pick
  n_shards ~ a few x cluster cores; a shard only ever needs its (id,
  n_tokens) pairs in one task, 16 bytes/row);
- within a shard, documents are taken in md5(seed || id) order (a stable,
  engine-portable scramble — the same order contract as
  :func:`eget_spark.operators.sampling.stratified_sample`), and placed
  next-fit: a doc goes into the current sequence iff it fits
  (fill + n_tokens <= capacity), else it OPENS a new sequence.  A doc
  longer than the capacity therefore always opens (and overflows) its own
  sequence — pinned semantics, callers wanting truncation cut upstream.

Next-fit (vs first-fit/best-fit) is the deliberate choice at scale: it is
single-pass streaming with O(1) state per shard, reproducible across
retries/partitionings/engines, and within ~2x of optimal occupancy — the
trade every production packer makes.

Plan shape: one projection computes (shard, order key) JVM-side, then a
single ``applyInPandas`` per shard runs the sequential fold (packing is
inherently a left fold — there is no relational form short of a recursive
CTE, which is exactly what the cross-engine oracle uses).  One shuffle on
shard, no driver involvement, Arrow-batched either side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "doc_id long, shard long, seq_no long, offset long, n_tokens long"
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    n_shards: int = 16,
    seed: str = "",
) -> DataFrame:
    """Assign (shard, seq_no, offset) to every row under next-fit packing.

    ``df`` needs ``id_col`` (integral) and ``tokens_col`` (token count).
    Returns (doc_id, shard, seq_no, offset, n_tokens): ``seq_no`` is the
    0-based sequence index within the shard, ``offset`` the token offset
    of the doc inside its sequence.  Deterministic: identical output for
    any partitioning of the input.
    """
    cap = int(capacity)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_k", "doc_id"], kind="mergesort")
        seq_no, fill = 0, 0
        seqs, offs = [], []
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and fill + n > cap:
                seq_no += 1
                fill = 0
            first = False
            seqs.append(seq_no)
            offs.append(fill)
            fill += n
        out = pdf[["doc_id", "shard", "n_tokens"]].copy()
        out["seq_no"] = pd.Series(seqs, index=pdf.index, dtype="int64")
        out["offset"] = pd.Series(offs, index=pdf.index, dtype="int64")
        return out[["doc_id", "shard", "seq_no", "offset", "n_tokens"]]

    prepared = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col).cast("long") % n_shards).alias("shard"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.md5(
            F.concat(F.lit(seed), F.col(id_col).cast("string"))
        ).alias("_k"),
    )
    return prepared.groupBy("shard").applyInPandas(_pack, _OUT_SCHEMA)
