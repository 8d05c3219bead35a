"""Crawl snapshot diff — what changed between two crawls of the same web.

An incremental crawler needs the delta between crawl N and crawl N+1:
which URLs appeared, vanished, changed content, or stayed identical —
both for recrawl scheduling (operators/recrawl.py consumes the change
signal) and for incremental downstream processing (only re-chunk/re-embed
the changed slice).  The reference's cache layer answers this one URL at
a time (services/cache/cache_service.py hash comparison on refetch); at
corpus scale it is one relational pass.

Semantics (pinned for the oracle): URLs join full-outer on the key;
``status`` is

- ``added``     — in the new snapshot only
- ``removed``   — in the old snapshot only
- ``changed``   — in both, fingerprints differ
- ``unchanged`` — in both, fingerprints equal

Scale shape (100 TB): ONE shuffle — the full-outer SortMergeJoin on the
URL key; fingerprints (here md5 of the content column, computed scan-side)
keep the shuffled payload at ~48 bytes/row regardless of document size.
Counting by status afterwards is a map-side-combined 4-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """(key, status, old_fp, new_fp) — one row per URL in either snapshot.

    Presence is tracked with explicit flags, NOT inferred from the
    fingerprint: a row whose content is NULL (e.g. a recorded failed
    fetch) has a NULL md5 but still EXISTS in its snapshot, and must
    classify as changed/unchanged/removed — never as 'added'.  The
    fingerprint comparison is null-safe (NULL content on both sides =
    unchanged)."""
    o = old.select(
        F.col(key_col).alias("key"),
        F.md5(F.col(content_col)).alias("old_fp"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("key"),
        F.md5(F.col(content_col)).alias("new_fp"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("key", status.alias("status"), "old_fp", "new_fp")


def diff_counts(diff: DataFrame) -> DataFrame:
    """(status, n) — the 4-row crawl-delta report."""
    return diff.groupBy("status").agg(F.count("*").cast("long").alias("n"))


def retain_last_k(
    snapshots: DataFrame,
    k: int,
    key_col: str = "url",
    version_col: str = "fetch_time",
) -> DataFrame:
    """Snapshot retention: keep the newest ``k`` versions per URL — the
    table-maintenance step every incremental crawl store runs (Iceberg's
    expire_snapshots expressed over the row history).  Order is version
    desc; ties on the version break by an md5 over the FULL row (JSON of
    every column — hashing only key|version would be CONSTANT within a
    tie group and leave the order partition-dependent).  Rows identical
    in every column remain interchangeable, which is outcome-identical
    whichever is kept.

    Scale shape: ONE hash exchange on the URL key feeding a window
    row_number (rank k is tiny, the sort is per-key); output adds
    ``keep`` so callers can either filter or anti-join the expired set.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(version_col).desc(),
        F.md5(F.to_json(F.struct(*[F.col(c) for c in snapshots.columns]))),
    )
    return snapshots.withColumn(
        "keep", (F.row_number().over(w) <= k).alias("keep")
    )
