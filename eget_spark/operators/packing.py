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


def striped_shards(
    df: DataFrame,
    id_col: str,
    size_col: str,
    n_shards: int,
) -> DataFrame:
    """Size-balanced output-shard assignment by striped size rank — the
    writer-side companion to :func:`pack_sequences`.  A 100 TB corpus
    written as N output files wants near-equal file sizes (equal-COUNT
    splits leave the biggest shard dominated by whichever partition drew
    the long documents; stragglers follow downstream).  Striping by
    size rank is the deterministic round-robin form of LPT scheduling:

    - rank documents by (size desc, id asc) — pinned total order;
    - ``shard = (rank - 1) % n_shards``.

    Every shard gets one document from each consecutive size band, so
    shard byte totals differ by at most (roughly) one band's spread;
    unlike greedy LPT the assignment is a pure rank expression —
    reproducible across engines and partitionings, no sequential state.

    Returns (id, size, shard) — feed ``df.repartition(n_shards,
    "shard")`` (or partitionBy on write) to materialize.

    Scale shape: the global size rank comes from
    :func:`eget_spark.operators.sequence.with_global_seq` — a RANGE
    exchange over (size, id) pairs only (16 bytes/row; the document text
    never enters the shuffle) with per-partition ranks + prefix offsets,
    NEVER a single-partition ``row_number() OVER (ORDER BY ...)``
    window.  Callers at extreme scale can pre-bucket by size decile and
    stripe within buckets, trading exactness for a narrower sort.
    """
    from .sequence import with_global_seq

    pairs = df.select(
        F.col(id_col).alias("id"),
        F.col(size_col).cast("long").alias("size"),
        (-F.col(size_col).cast("long")).alias("_negsize"),
    )
    res = with_global_seq(pairs, ["_negsize", "id"], start=1, seq_col="_rk")
    out = res.df.select(
        "id", "size", ((F.col("_rk") - 1) % int(n_shards)).cast("long").alias("shard")
    ).localCheckpoint()
    res.unpersist()
    return out


def shard_stats(assigned: DataFrame) -> DataFrame:
    """(shard, n_docs, total_size) over :func:`striped_shards` output —
    the balance report (map-side-combined groupBy, |shards| rows)."""
    return assigned.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("size").cast("long").alias("total_size"),
    )


_OUT2D_SCHEMA = (
    "doc_id long, shard long, seq_no long, tok_offset long, "
    "img_offset long, n_tokens long, n_images long"
)


def pack_sequences_2d(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    images_col: str,
    cap_tokens: int,
    cap_images: int,
    n_shards: int = 16,
    seed: str = "",
) -> DataFrame:
    """Two-resource next-fit packing for INTERLEAVED multimodal docs.

    Multimodal training sequences are bounded on BOTH axes: the token
    context length and the per-sequence image-slot budget (the vision
    encoder batches a fixed number of tiles per sequence).  A doc joins
    the current sequence iff it fits BOTH (fill_tok + t <= cap_tokens AND
    fill_img + i <= cap_images), else it opens a new sequence; a doc
    exceeding either capacity alone still opens (and overflows) its own
    sequence — :func:`pack_sequences`'s pinned overflow contract, lifted
    to two dimensions.  Same determinism/scale contract too: sharded by
    ``id % n_shards``, md5(seed||id) order within a shard, one
    ``applyInPandas`` fold per shard, O(1) state.
    """
    ct, ci = int(cap_tokens), int(cap_images)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_k", "doc_id"], kind="mergesort")
        seq_no, ft, fi = 0, 0, 0
        seqs, toffs, ioffs = [], [], []
        first = True
        for t, i in zip(pdf["n_tokens"], pdf["n_images"]):
            t, i = int(t), int(i)
            if not first and (ft + t > ct or fi + i > ci):
                seq_no += 1
                ft, fi = 0, 0
            first = False
            seqs.append(seq_no)
            toffs.append(ft)
            ioffs.append(fi)
            ft += t
            fi += i
        out = pdf[["doc_id", "shard", "n_tokens", "n_images"]].copy()
        out["seq_no"] = pd.Series(seqs, index=pdf.index, dtype="int64")
        out["tok_offset"] = pd.Series(toffs, index=pdf.index, dtype="int64")
        out["img_offset"] = pd.Series(ioffs, index=pdf.index, dtype="int64")
        return out[
            ["doc_id", "shard", "seq_no", "tok_offset", "img_offset",
             "n_tokens", "n_images"]
        ]

    prepared = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col).cast("long") % n_shards).alias("shard"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.col(images_col).cast("long").alias("n_images"),
        F.md5(
            F.concat(F.lit(seed), F.col(id_col).cast("string"))
        ).alias("_k"),
    )
    return prepared.groupBy("shard").applyInPandas(_pack, _OUT2D_SCHEMA)
