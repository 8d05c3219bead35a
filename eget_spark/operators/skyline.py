"""2-D skyline (Pareto frontier) over per-entity metric points.

Crawl and curation decisions constantly trade two axes — content bytes
per fetch vs politeness cost, quality score vs token price, coverage vs
recrawl budget.  The set of non-dominated options is the skyline
(Börzsönyi, Kossmann & Stocker, ICDE 2001): point p survives iff no q
has BOTH coordinates >= p's with at least one strictly greater (so
exact ties on both axes all survive — neither dominates).

Closed form used here (maximize both axes): group points by x with
gy = max y in the group; p = (x, y) is on the skyline iff

    y == gy(x)                 (nothing at the SAME x beats it), and
    maxy_gt(x) < y             (nothing at STRICTLY greater x ties-or-
                                beats it; vacuous at the max x)

where maxy_gt is the EXCLUSIVE prefix max of gy in descending-x order.

Scale shape (100 TB): the x-group table is one map-side-combined
groupBy; the exclusive prefix max runs the with_global_seq mechanism —
range-exchange on descending x, per-partition running max window, and
driver-bounded per-partition maxima (one row per shuffle partition, the
sequence.py offset discipline) broadcast back as prefix seeds.  NEVER a
SinglePartition window.  The final membership test is one hash join of
the points against their x group.  No Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(id, x, y) rows on the maximize-both Pareto frontier, ordered
    (x desc, y desc, id)."""
    spark = points.sparkSession
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    xg = pts.groupBy("x").agg(F.max("y").cast("long").alias("gy"))
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = (
        xg.withColumn("_negx", (-F.col("x")).cast("long"))
        .repartitionByRange(nparts, F.col("_negx"))
        .sortWithinPartitions("_negx")
        .withColumn("_pid", F.spark_partition_id().cast("long"))
        .persist()
    )
    # driver-bounded metadata: ONE row per shuffle partition (the
    # sequence.py offset discipline), never data rows
    pmax = {
        r["_pid"]: r["m"]
        for r in parts.groupBy("_pid").agg(F.max("gy").alias("m")).collect()
    }
    seeds = []
    acc = None
    for pid in sorted(pmax):
        seeds.append((pid, acc))
        acc = pmax[pid] if acc is None else max(acc, pmax[pid])
    seed_df = spark.createDataFrame(
        seeds or [], "_pid long, _pref long"
    )
    w_excl = (
        Window.partitionBy("_pid")
        .orderBy("_negx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = (
        parts.join(F.broadcast(seed_df), "_pid", "left")
        .withColumn("_inmax", F.max("gy").over(w_excl))
        # greatest() skips NULLs: NULL only when both prefixes are empty
        .withColumn("maxy_gt", F.greatest("_inmax", "_pref"))
        .select("x", "gy", "maxy_gt")
    )
    out = (
        pts.join(grp, "x")
        .where(
            (F.col("maxy_gt").isNull() | (F.col("maxy_gt") < F.col("y")))
            & (F.col("y") == F.col("gy"))
        )
        .select("id", "x", "y")
        .orderBy(F.col("x").desc(), F.col("y").desc(), "id")
        .localCheckpoint()
    )
    parts.unpersist()
    return out
