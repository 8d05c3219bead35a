"""Append-only, round-partitioned tables (the Iceberg-shaped storage layer).

In deployment these are Iceberg tables (`writeTo(...).append()` per crawl
round = one snapshot; resume = read up to the last committed round;
snapshot expiry = the reference's cache TTL, SURVEY.md S4). Iceberg jars
are not on this sandbox's classpath, so the default backend is plain
parquet directories with `round=N` partitions — the layout is identical
and `crawl()` is backend-agnostic.

To use Iceberg, configure a catalog on the session, e.g.::

    spark.sql.catalog.eget = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.eget.type = hadoop
    spark.sql.catalog.eget.warehouse = <path>

and pass ``catalog="eget"`` — writes become Iceberg appends; everything
else is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RoundTable:
    """One logical table appended once per crawl round."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        name: str,
        catalog: str | None = None,
    ):
        self.spark = spark
        self.root = root
        self.name = name
        self.catalog = catalog
        if catalog is not None:
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
            if not impl:
                raise ValueError(
                    f"catalog '{catalog}' not configured on this session"
                )

    # -- write ---------------------------------------------------------------

    def append(self, df: DataFrame, round_no: int) -> None:
        if self.catalog:
            full = f"{self.catalog}.{self.name}"
            out = df.withColumn("round", F.lit(round_no))
            try:
                out.writeTo(full).append()
            except Exception:
                out.writeTo(full).using("iceberg").partitionedBy("round").create()
            return
        df.write.mode("overwrite").parquet(f"{self.root}/{self.name}/round={round_no}")

    # -- read ----------------------------------------------------------------

    def read(self) -> DataFrame:
        if self.catalog:
            return self.spark.table(f"{self.catalog}.{self.name}")
        return self.spark.read.option(
            "basePath", f"{self.root}/{self.name}"
        ).parquet(f"{self.root}/{self.name}/round=*")

    def read_round(self, round_no: int) -> DataFrame:
        if self.catalog:
            return self.read().where(F.col("round") == round_no).drop("round")
        return self.spark.read.parquet(f"{self.root}/{self.name}/round={round_no}")

    def read_upto(self, round_no: int) -> DataFrame:
        return self.read().where(F.col("round") <= round_no)

    def rounds(self) -> list[int]:
        try:
            return sorted(
                r["round"]
                for r in self.read().select("round").distinct().collect()
            )
        except Exception:
            return []


class CrawlRun:
    """The four tables one crawl run maintains (SURVEY.md §1.3)."""

    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.docs = RoundTable(spark, root, "docs", catalog)
        self.admitted = RoundTable(spark, root, "admitted", catalog)
        self.pending = RoundTable(spark, root, "pending", catalog)
        self.log = RoundTable(spark, root, "log", catalog)


def write_bucketed_corpus(
    docs: DataFrame, name: str, buckets: int = 64, sort: bool = True
) -> DataFrame:
    """Register the fetch corpus as a parquet table bucketed (and sorted)
    on ``doc_id`` — the co-located-join layout for the crawl's J1 fetch
    join at 100 TB: the corpus side of ``frontier JOIN corpus ON
    url = doc_id`` is read in bucket order with NO exchange; only the
    (much smaller) frontier shuffles into the bucket partitioning.  Any
    repeated-scan workload (multi-crawl fleets over one corpus snapshot)
    amortizes the one-time bucketing write across every subsequent round
    of every crawl.

    Pass the returned table handle (or ``spark.table(name)``) as ``docs``
    to ``crawl()`` — Catalyst picks up the bucket spec automatically; no
    engine changes needed.  Bucket count should match (or divide) the
    session's shuffle partitioning at scale.  (Iceberg deployments express
    the same layout as a bucket-partitioned table; this writer covers the
    parquet/catalog-less sandbox.)"""
    spark = docs.sparkSession
    if "." in name:
        # a qualified name (db.tbl) lives at <db>.db/<tbl>, not
        # warehouse/<name> — the orphan-cleanup below would compute the
        # wrong path and silently skip it; reject rather than mis-clean
        # (round-2 advice)
        raise ValueError(
            "write_bucketed_corpus takes an unqualified table name "
            f"(got {name!r}); set the database via spark.catalog first"
        )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # an orphaned managed-table location (crashed earlier write, catalog
    # lost across sessions) blocks CREATE: clear it
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    wh_path = wh.path or wh.netloc
    if wh.scheme in ("", "file") and wh_path:
        # empty warehouse conf would make the rmtree cwd-relative — skip
        import shutil

        shutil.rmtree(os.path.join(wh_path, name.lower()), ignore_errors=True)
    w = docs.write.mode("overwrite").format("parquet").bucketBy(buckets, "doc_id")
    if sort:
        w = w.sortBy("doc_id")
    w.saveAsTable(name)
    return spark.table(name)
