"""Range join: point-in-interval lookup via bucket-equi-join.

The crawl/curation lookup primitive for interval tables — IP->geo/ASN
blocks (spam scoring, politeness by network), byte-offset->WARC segment,
timestamp->maintenance window.  A naive `p BETWEEN lo AND hi` join is an
inequality join, which Spark executes as a broadcast nested loop or
range cross join — quadratic per partition and the classic 100-TB
killer.  The public fix (interval bucketing — e.g. Databricks' range
join "bin" optimization, described in their SQL docs) turns it into an
EQUI join: each interval explodes to the fixed-width buckets it
overlaps, each point hashes to its one bucket, candidates equi-join on
the bucket id, and exact containment filters the stragglers.

Pinned semantics:

- intervals are half-open ``[lo, hi)``; a point on ``hi`` does NOT match
- a point inside several intervals gets ONE winner: smallest
  ``(hi - lo, lo, md5(values))`` — the most specific (narrowest)
  interval, ties broken engine-portably
- points outside every interval keep a NULL value (left join back)

Scale shape: ONE equi hash join on the bucket id + a per-point window
over the (tiny) candidate set.  Explosion factor = avg interval width /
bucket_width — callers pick bucket_width ~ the median interval width so
each interval lands in O(1) buckets.  The points side never explodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def range_lookup(
    points: DataFrame,
    ranges: DataFrame,
    id_col: str,
    point_col: str,
    lo_col: str,
    hi_col: str,
    value_cols: list[str],
    bucket_width: int = 64,
) -> DataFrame:
    """Every ``points`` row (id, point) joined to the winning containing
    interval's ``value_cols`` (NULL when uncovered).  Integral domains
    only (the bucket arithmetic is exact)."""
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    bw = F.lit(int(bucket_width))
    rb = ranges.select(
        F.col(lo_col).alias("_lo"),
        F.col(hi_col).alias("_hi"),
        *[F.col(c) for c in value_cols],
    ).where(F.col("_hi") > F.col("_lo"))
    rb = rb.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("_lo") / bw).cast("long"),
                F.floor((F.col("_hi") - 1) / bw).cast("long"),
            )
        ).alias("_b"),
    )
    pb = points.select(
        F.col(id_col).alias("_id"),
        F.col(point_col).alias("_p"),
        F.floor(F.col(point_col) / bw).cast("long").alias("_b"),
    )
    cand = pb.join(rb, "_b").where(
        (F.col("_p") >= F.col("_lo")) & (F.col("_p") < F.col("_hi"))
    )
    w = Window.partitionBy("_id").orderBy(
        (F.col("_hi") - F.col("_lo")),
        F.col("_lo"),
        F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in value_cols])),
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_id", *[F.col(c) for c in value_cols])
    )
    return (
        points.select(F.col(id_col).alias("_id"), F.col(point_col).alias("_p"))
        .join(best, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_p").alias(point_col),
            *[F.col(c) for c in value_cols],
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 64,
) -> DataFrame:
    """Interval x interval overlap pairs — (left_id, right_id,
    overlap) for every pair of half-open intervals that intersect
    (session collision, crawl-window conflict, maintenance overlap).

    Same bucketing as :func:`range_lookup`, plus the CLAIM-BUCKET trick
    to avoid a pair-set distinct: a pair overlapping across k buckets is
    emitted ONLY from the bucket containing ``max(l_lo, r_lo)`` (the
    first bucket where both are live) — candidate dedup costs a filter,
    not a shuffle.  ``overlap = min(hi) - max(lo)`` in the interval
    unit.  Scale: one bucket equi join; explosion factor = interval
    width / bucket_width per side.
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    bw = F.lit(int(bucket_width))

    def explode_side(df: DataFrame, idc: str, tag: str) -> DataFrame:
        return (
            df.select(
                F.col(idc).alias(f"{tag}_id"),
                F.col(lo_col).alias(f"{tag}_lo"),
                F.col(hi_col).alias(f"{tag}_hi"),
            )
            .where(F.col(f"{tag}_hi") > F.col(f"{tag}_lo"))
            .select(
                "*",
                F.explode(
                    F.sequence(
                        F.floor(F.col(f"{tag}_lo") / bw).cast("long"),
                        F.floor((F.col(f"{tag}_hi") - 1) / bw).cast("long"),
                    )
                ).alias("_b"),
            )
        )

    l = explode_side(left, left_id, "l")
    r = explode_side(right, right_id, "r")
    start = F.greatest(F.col("l_lo"), F.col("r_lo"))
    return (
        l.join(r, "_b")
        .where(
            (F.col("l_lo") < F.col("r_hi"))
            & (F.col("r_lo") < F.col("l_hi"))
            & (F.col("_b") == F.floor(start / bw).cast("long"))
        )
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            (F.least(F.col("l_hi"), F.col("r_hi")) - start).alias("overlap"),
        )
    )
