"""KMV (k minimum values) distinct sketch with set-operation estimates.

The OTHER classic distinct sketch next to HyperLogLog (operators/hll.py):
keep the k smallest hash values of a set; the k-th smallest estimates
density (Bar-Yossef et al. 2002; Beyer et al. 2007 gave the unbiased
(k-1)/theta form).  What KMV buys over HLL is SET OPERATIONS — because
the sketch stores actual hash values, two sketches intersect/union
meaningfully: Jaccard ~= |K(A∪B) ∩ A ∩ B| / k, and intersection size ~=
Jaccard x |A∪B| — the dedup-planning question ("how much do these two
crawls overlap?") that HLL registers cannot answer.

Everything is pinned engine-portable:

- element hash = the repo-standard md5-60bit
  (``('0x' || substr(md5(x), 1, 15))::BIGINT`` — uniform on [0, 2^60)),
  identical in Spark and DuckDB by construction
- sketch = the k smallest DISTINCT hashes per set (row_number over a
  distinct frame)
- estimate: n < k -> exact n (the sketch holds the whole set), else
  ``round((k-1) / (max_h / 2^60), 6)`` — two exactly-rounded IEEE
  divisions + the repo-wide round(6) pin

Scale shape: the distinct + per-set top-k is one shuffle on the set
key (the k-row-per-set output is sketch-sized); set-op estimates join
SKETCHES (k rows each), never raw data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TWO60 = float(1 << 60)


def md5_60bit(col: Column) -> Column:
    """The repo-standard portable 60-bit hash."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_sketches(
    df: DataFrame, set_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(set, h, rn) rows — the k smallest distinct element hashes per
    set, rn = 1-based rank.  This IS the sketch (k rows per set)."""
    h = (
        df.select(
            F.col(set_col).alias("set"),
            md5_60bit(F.col(value_col)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("set").orderBy("h")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """(set, n_sketch, est_distinct) from kmv_sketches output."""
    return sketches.groupBy("set").agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                (F.lit(float(k - 1))) / (F.max("h") / F.lit(TWO60))
            ),
            6,
        ).alias("est_distinct"),
    )


def kmv_set_ops(
    sketches: DataFrame, set_a: str, set_b: str, k: int = 64
) -> DataFrame:
    """One row: (n_union_sketch, est_union, matches, jaccard,
    est_intersection) for the two named sets, computed purely from
    their sketches (k rows each — never the raw sets):

    - union sketch = k smallest of the merged hash pool
    - est_union    = KMV estimate of that sketch
    - jaccard      = |union sketch ∩ A ∩ B| / |union sketch|
    - est_intersection = round(jaccard * est_union, 6)
    """
    a = sketches.where(F.col("set") == set_a).select("h")
    b = sketches.where(F.col("set") == set_b).select("h")
    pool = a.unionByName(b).distinct()
    w = Window.orderBy("h")
    ksk = (
        pool.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    )
    both = a.join(b, "h")  # hashes present in BOTH sketches
    marked = ksk.join(both.withColumn("_inboth", F.lit(1)), "h", "left")
    return marked.agg(
        F.count("*").cast("long").alias("n_union_sketch"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                F.lit(float(k - 1)) / (F.max("h") / F.lit(TWO60))
            ),
            6,
        ).alias("est_union"),
        F.sum(F.coalesce(F.col("_inboth"), F.lit(0)))
        .cast("long")
        .alias("matches"),
    ).select(
        "n_union_sketch",
        "est_union",
        "matches",
        F.round(F.col("matches") / F.col("n_union_sketch"), 6).alias("jaccard"),
        F.round(
            F.round(F.col("matches") / F.col("n_union_sketch"), 6)
            * F.col("est_union"),
            6,
        ).alias("est_intersection"),
    )
