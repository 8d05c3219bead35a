"""Cluster entrypoint: crawl captures -> web archive via spark-submit
(the third job face next to jobs/crawl_job.py and jobs/curate_job.py —
"crawl the web, ship training shards, AND keep the archive").

    zip -r /tmp/eget_spark.zip eget_spark
    spark-submit --py-files /tmp/eget_spark.zip jobs/archive_job.py \
        --input  hdfs://.../captures_parquet \
        --output hdfs://.../archive_run_01 \
        --warc-shards 512 --block-size 3000 --gzip \
        --shuffle-partitions 2048

Composes the oracle-verified archive operators end-to-end:

1. **revisit dedup** (sources/warc.revisit_dedup, WARC 1.1 §6.7.2
   identical-payload-digest): recrawls of byte-identical content store
   zero payload bytes; the full capture history survives as ``revisit``
   records.
2. **WARC sink** (sources/warc.write_warc_partitions): original
   responses only, hash-partitioned on the registrable domain into
   ``--warc-shards`` member files so one site stays in few files.
3. **CDX index** (sources/warc.read_warc + functions/urls.surt_key):
   the files are re-read and every record's byte coordinates become a
   (surt, url, date, status, offset, length, file) row — written
   range-partitioned AND sorted by surt, the web-archive lookup layout.
4. **ZipNum secondary index** (sources/warc.zipnum_blocks): the sorted
   surt stream cut into ``--block-size``-key front-coded blocks; one
   (first_key, block) row per block is what a wayback query binary-
   searches at 10^10 URLs.

Writes under --output:

    revisits/  full capture history (url, fetch_time, digest,
               record_type, refers_to, stored_bytes)
    warc/      (file_name, content, n_records) member files
    cdx/       surt-sorted CDX rows
    zipnum/    secondary-index block table
    sitemaps/  (with --sitemap-base) sitemap-<id>.xml shards +
               sitemapindex.xml over the archived URL set — the
               sitemaps.org publication layer a wayback frontend or
               downstream recrawl seeds from (local/shared fs writer)
    report.json one line of driver-side counters (also printed)

No ``master``/executor sizing here — spark-submit owns it (crawl_job's
contract).  Scale shape: one window keyed (url, digest) for dedup, one
repartition on domain for the sink, one range exchange for the CDX
sort; WARC parsing is per-file Arrow batches — no all-pairs, no driver
rows beyond the report counters.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="eget_spark archive job")
    p.add_argument("--input", required=True,
                   help="parquet path of captures (url, payload[, fetch_time, "
                        "status, content_type])")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--url-col", default="url")
    p.add_argument("--payload-col", default="payload")
    p.add_argument("--time-col", default="fetch_time",
                   help="capture-time column; synthesized as 0 when absent "
                        "(single-snapshot corpus)")
    p.add_argument("--status-col", default=None)
    p.add_argument("--content-type-col", default=None)
    p.add_argument("--warc-shards", type=int, default=16,
                   help="WARC member-file count (one file per partition)")
    p.add_argument("--block-size", type=int, default=3000,
                   help="CDX keys per ZipNum block")
    p.add_argument("--gzip", action="store_true",
                   help="gzip WARC members (per-record gzip members, the "
                        "Common Crawl layout)")
    p.add_argument("--sitemap-base", default=None,
                   help="publish sitemap shards + sitemapindex for the "
                        "archived URL set under this base URL (needs a "
                        "shared filesystem for --output)")
    p.add_argument("--sitemap-shard-size", type=int, default=50000)
    p.add_argument("--cdx-partitions", type=int, default=None,
                   help="range partitions of the sorted CDX output "
                        "(default: shuffle parallelism)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def main(argv: list[str], spark=None) -> int:
    args = parse_args(argv)
    owns_session = spark is None
    if owns_session:
        from pyspark.sql import SparkSession

        b = SparkSession.builder.appName("eget_spark_archive")
        if args.shuffle_partitions:
            b = b.config(
                "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
            )
        b = b.config("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark = b.getOrCreate()

    from pyspark.sql import functions as F

    from eget_spark.functions.urls import host_of, registrable_domain, surt_key
    from eget_spark.sources.warc import (
        read_warc,
        revisit_dedup,
        write_warc_partitions,
        zipnum_blocks,
    )

    t0 = time.monotonic()
    out = args.output.rstrip("/")
    raw = spark.read.parquet(args.input)
    has_time = args.time_col in raw.columns
    caps = raw.select(
        F.col(args.url_col).alias("url"),
        (
            F.col(args.payload_col)
            if dict(raw.dtypes)[args.payload_col] == "binary"
            else F.encode(F.col(args.payload_col), "utf-8")
        ).alias("payload"),
        (
            F.col(args.time_col).cast("long")
            if has_time
            else F.lit(0).cast("long")
        ).alias("fetch_time"),
        *(
            [F.col(args.status_col).alias("_status")]
            if args.status_col
            else []
        ),
        *(
            [F.col(args.content_type_col).alias("_ctype")]
            if args.content_type_col
            else []
        ),
    ).persist()
    n_caps = caps.count()

    # 1. revisit dedup: capture history with zero-byte revisit records
    history = revisit_dedup(caps, "url", "payload", "fetch_time")
    history.write.mode("overwrite").parquet(f"{out}/revisits")
    history = spark.read.parquet(f"{out}/revisits")
    hist_stats = history.agg(
        F.sum(F.when(F.col("record_type") == "response", 1).otherwise(0))
        .alias("originals"),
        F.sum(F.when(F.col("record_type") == "revisit", 1).otherwise(0))
        .alias("revisits"),
        F.sum("stored_bytes").alias("stored_bytes"),
    ).collect()[0]

    # 2. WARC member files: original responses only, clustered by domain
    originals = caps.join(
        history.where(F.col("record_type") == "response").select(
            "url", "fetch_time"
        ),
        ["url", "fetch_time"],
    )
    sharded = originals.repartition(
        args.warc_shards, registrable_domain(host_of(F.col("url")))
    )
    files = write_warc_partitions(
        sharded,
        "url",
        "payload",
        status_col="_status" if args.status_col else None,
        content_type_col="_ctype" if args.content_type_col else None,
        gzip_members=args.gzip,
    )
    files.write.mode("overwrite").parquet(f"{out}/warc")
    files = spark.read.parquet(f"{out}/warc")
    n_files = files.count()

    # 3. CDX rows from the written bytes, range-sorted on surt
    parsed = read_warc(
        files.select(F.col("file_name").alias("path"), "content")
    )
    cdx = parsed.select(
        surt_key(F.col("url")).alias("surt"),
        "url",
        "warc_date",
        "status",
        F.col("path").alias("warc_file"),
        F.col("offset").alias("rec_offset"),
        "rec_len",
    )
    n_cdx_parts = args.cdx_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    cdx.repartitionByRange(n_cdx_parts, "surt").sortWithinPartitions(
        "surt"
    ).write.mode("overwrite").parquet(f"{out}/cdx")
    cdx = spark.read.parquet(f"{out}/cdx")
    n_cdx = cdx.count()

    # 4. ZipNum secondary index over the sorted key stream
    blocks = zipnum_blocks(cdx, "surt", block_size=args.block_size)
    blocks.write.mode("overwrite").parquet(f"{out}/zipnum")
    blocks = spark.read.parquet(f"{out}/zipnum")
    n_blocks = blocks.count()

    # 5. optional published sitemap of the archived URL set
    n_sitemaps = 0
    if args.sitemap_base:
        from eget_spark.sources.sitemaps import save_sitemap_shards

        urls = originals.select("url").distinct().withColumnRenamed(
            "url", "loc"
        )
        save_sitemap_shards(
            urls,
            f"{out}/sitemaps",
            args.sitemap_base,
            shard_size=args.sitemap_shard_size,
        )
        import os as _os

        n_sitemaps = sum(
            1
            for f in _os.listdir(f"{out}/sitemaps")
            if f.startswith("sitemap-")
        )
    caps.unpersist()

    report = {
        "captures": n_caps,
        "originals": int(hist_stats["originals"] or 0),
        "revisits": int(hist_stats["revisits"] or 0),
        "stored_bytes": int(hist_stats["stored_bytes"] or 0),
        "warc_files": n_files,
        "cdx_rows": n_cdx,
        "zipnum_blocks": n_blocks,
        "sitemap_shards": n_sitemaps,
        "wall_sec": round(time.monotonic() - t0, 3),
    }
    line = json.dumps(report, sort_keys=True)
    print(line)
    spark.createDataFrame([(line,)], "json string").coalesce(1).write.mode(
        "overwrite"
    ).text(f"{out}/report.json")
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
