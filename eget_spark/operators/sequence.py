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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    start: int = 0,
    seq_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``seq_col`` = start + (1-based global rank by order_cols) - 1."""
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    parts = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:  # empty input: no rows, any typed constant works
        out = parts.withColumn(seq_col, F.lit(start).cast("long")).drop("_pid")
        out._eget_tmp_persist = parts  # type: ignore[attr-defined]
        return out
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        parts.withColumn(
            seq_col,
            (offmap[F.col("_pid")] + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_pid")
    )
    # caller is responsible for unpersisting once `out` is materialized
    out._eget_tmp_persist = parts  # type: ignore[attr-defined]
    return out
