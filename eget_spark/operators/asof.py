"""AS-OF join: each left event gets the most recent right version at or
before its timestamp — per key.

The crawl's temporal-correctness primitive: "which robots.txt version
governed THIS fetch", "which sitemap lastmod was current when we
scheduled", "which politeness budget applied at hour H".  The reference
re-reads robots at fetch time (in-memory cache, crawler_service.py) so
the question never arises there; a log-structured engine replaying or
auditing a crawl needs the join.  Public recipe: kdb's aj / pandas
merge_asof semantics; the SCALABLE Spark form below is the union-window
trick (no per-key loops, no range cross join).

Pinned semantics (backward as-of):

- match: the right row with the LARGEST right_time <= left_time for the
  same key; ties inside the right table break by later-wins on the
  md5 of its value columns? NO — ties are pinned right-row-last-wins in
  (right_time, md5(value)) order, so duplicate timestamps are
  deterministic under any partitioning
- a left row earlier than every right version gets NULL value columns
  (callers treat that as "no version yet")

Scale shape (100 TB of events vs millions of versions): ONE shuffle —
both sides union into a single frame hash-partitioned on the key, one
per-key sort by (time, side), and a running ``last(value,
ignoreNulls)`` window fills versions forward; left rows are then
filtered back out.  Compare the naive alternatives a 1000-executor
cluster cannot afford: an inequality join is a range cross join
(quadratic per key), and per-key applyInPandas serializes the big side
through Python.  Right rows sort BEFORE left rows at equal timestamps
(side 0 < 1), so a version taking effect exactly at fetch time governs
that fetch — the kdb aj convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join.  Returns every ``left`` row (all its columns)
    plus ``value_cols`` from the governing ``right`` row (NULL when no
    right row is old enough).  ``left_time`` / ``right_time`` must be
    mutually comparable (same type)."""
    left_cols = [c for c in left.columns]
    if key not in left_cols:
        raise ValueError(f"left missing key {key!r}")
    for c in value_cols:
        if c in left_cols:
            raise ValueError(f"value col {c!r} collides with a left column")

    # the whole governing right row rides as ONE struct and is forward-
    # filled atomically — per-column last(ignorenulls) would pull a NULL
    # column's value from an OLDER version, stitching two versions
    # together (violating "the single right row with the largest
    # right_time <= left_time")
    r = right.select(
        F.col(key),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        # md5 tie-break: duplicate right timestamps resolve identically
        # on every engine and partitioning (last in this order wins)
        F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in value_cols])).alias(
            "_tie"
        ),
        F.struct(*[F.col(c) for c in value_cols]).alias("_v"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left_cols if c not in (key, left_time)],
    )
    l = left.select(
        F.col(key),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit("").alias("_tie"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in value_cols
            )
            + ">"
        )
        .alias("_v"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols if c not in (key, left_time)],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        F.col(key),
        "_t",
        "_side",
        F.last("_v", ignorenulls=True).over(w).alias("_v"),
        *[F.col(f"_l_{c}") for c in left_cols if c not in (key, left_time)],
    )
    return filled.where(F.col("_side") == 1).select(
        F.col(key),
        *[F.col(f"_l_{c}").alias(c) for c in left_cols if c not in (key, left_time)],
        F.col("_t").alias(left_time),
        *[F.col("_v")[c].alias(c) for c in value_cols],
    )
