"""Media-reference referential-integrity audit (spans <-> blob store).

The reference stores media out-of-line (screenshot/media files keyed by
reference id — services/crawler/crawler_service.py screenshot path;
functions/media.py documents the repo's media_ref model).  At 100 TB the
span table and the blob store drift: crawl retries drop blobs, GC removes
blobs whose pages were re-extracted, and re-crawls orphan old blobs.  The
standard maintenance job is a two-sided anti-join audit:

- DANGLING ref: a span references ``media_ref`` but no blob row exists
  (page render would 404 — must re-fetch or strip the span);
- ORPHAN blob: a blob row no media span references (dead storage — GC
  candidate).

Plan shape: distinct refs per side, then two ``LEFT ANTI`` joins on the
ref key and one map-side-combined rollup per audit bucket.  Both sides
can be petabyte-scale, so neither is broadcast by default — the joins
shuffle on the ref hash (AQE picks broadcast when one side turns out
small).  Zero Python, zero driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def media_audit(
    refs: DataFrame,
    blobs: DataFrame,
    bucket: Column,
    ref_col: str = "media_ref",
    blob_col: str = "media_ref",
) -> DataFrame:
    """(bucket, n_refs, n_dangling, n_orphans) per audit bucket.

    ``refs``: one row per media span (may repeat a ref — counted
    distinct).  ``blobs``: one row per stored blob.  ``bucket`` is a
    Column over the REF side grouping the report (host, shard, source);
    orphan blobs carry their own bucket column named ``bucket``.
    """
    r = refs.select(
        bucket.alias("bucket"), F.col(ref_col).alias("_ref")
    ).distinct()
    b = blobs.select(
        F.col("bucket"), F.col(blob_col).alias("_ref")
    ).distinct()
    dangling = r.join(b.select("_ref").distinct(), "_ref", "left_anti")
    orphans = b.join(r.select("_ref").distinct(), "_ref", "left_anti")
    per_ref = r.groupBy("bucket").agg(F.count("*").alias("n_refs"))
    per_dang = dangling.groupBy("bucket").agg(
        F.count("*").alias("n_dangling")
    )
    per_orph = orphans.groupBy("bucket").agg(F.count("*").alias("n_orphans"))
    return (
        per_ref.join(per_dang, "bucket", "left")
        .join(per_orph, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_refs", F.lit(0)).alias("n_refs"),
            F.coalesce("n_dangling", F.lit(0)).alias("n_dangling"),
            F.coalesce("n_orphans", F.lit(0)).alias("n_orphans"),
        )
    )
