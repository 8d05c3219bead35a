"""Deterministic global sequence numbers without a single-partition sort.

The reference's FIFO admission order (queue_manager.py:34-57 under the
SURVEY.md §2.10 determinism contract) requires a *total order* over each
round's candidates.  A naive ``row_number() OVER (ORDER BY ...)`` collapses
to one partition — a non-starter at 10^8-row rounds.  Instead:

1. ``repartitionByRange`` on the order keys (range exchange — partition i
   holds keys <= partition i+1's),
2. sort within partitions,
3. per-partition ``row_number`` + partition-count prefix offsets (a tiny
   ``groupBy(partition_id).count()`` collect — one row per partition).

The result is the exact global rank, computed with two shuffles of which
only the range exchange touches the data.  Ties must be impossible (callers
order by a unique key set) or ranks at range boundaries become ambiguous.

Plan-shape note (measured, round 2): the prefix offsets are joined in as a
tiny broadcast DataFrame rather than embedded as ``create_map`` literals —
literal maps change the generated code every round (different offsets =>
janino recompile, ~1-2 s/round of pure driver stall in iterative callers);
a broadcast join keeps the plan template identical across rounds so the
whole-stage-codegen cache hits.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class SeqResult:
    """Result of :func:`with_global_seq`.

    ``df`` reads from the persisted, sorted candidate set.  The caller must
    materialize ``df`` (checkpoint/write/collect) and then call
    :meth:`unpersist` — holding the handles explicitly here replaces the
    fragile ``_eget_tmp_persist`` attribute hand-off flagged in round 1
    (attributes don't survive DataFrame transformations).
    """

    df: DataFrame
    total: int  # total input rows (= sum of per-partition counts, free)
    persisted: list[DataFrame]

    def unpersist(self) -> None:
        for p in self.persisted:
            p.unpersist()


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    start: int = 0,
    seq_col: str = "seq",
    num_partitions: int | None = None,
) -> SeqResult:
    """Add ``seq_col`` = start + (1-based global rank by order_cols) - 1."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    handles: list[DataFrame] = []
    if num_partitions == 1:
        # single partition: a round-robin exchange needs no range bounds,
        # so the hidden RangePartitioner SAMPLING JOB (which would traverse
        # the whole input pipeline a second time) is skipped entirely
        exchanged = df.repartition(1)
    else:
        # persist the input so the range exchange's bound-sampling job and
        # the exchange itself compute the (expensive) candidate pipeline
        # once, not twice
        src = df.persist()
        handles.append(src)
        exchanged = src.repartitionByRange(
            num_partitions, *[F.col(c) for c in order_cols]
        )
    parts = (
        exchanged.sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    handles.insert(0, parts)
    counts = {
        r["_pid"]: r["cnt"]
        for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets = []
    acc = start
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:  # empty input: no rows, any typed constant works
        out = parts.withColumn(seq_col, F.lit(start).cast("long")).drop("_pid")
        return SeqResult(out, 0, handles)
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(
            seq_col, (F.col("_off") + F.row_number().over(w) - 1).cast("long")
        )
        .drop("_pid", "_off")
    )
    return SeqResult(out, total, handles)
