"""Cluster entrypoint: crawl corpus -> curated training data via
spark-submit (the companion to jobs/crawl_job.py — together they are the
full "crawl the web, ship training shards" product surface).

    zip -r /tmp/eget_spark.zip eget_spark
    spark-submit --py-files /tmp/eget_spark.zip jobs/curate_job.py \
        --input  hdfs://.../crawled_docs_parquet \
        --output hdfs://.../curated_run_01 \
        --languages en de --min-quality 0.3 --gopher-rules \
        --scrub-pii --pack-capacity 2048 --pack-shards 256 \
        --shuffle-partitions 2048

Composes the oracle-verified operators end-to-end
(eget_spark/pipeline.prepare_training_data): annotate -> quality/Gopher
filters -> exact + near-dup dedup -> optional PII scrub -> chunk ->
optional next-fit sequence packing (operators/packing.pack_sequences) ->
size-balanced output shards (striped_shards).  Writes under --output:

    docs/      annotated surviving documents (+shard column)
    chunks/    training chunks
    dropped/   (id, reason) per filtered document
    packing/   (doc_id, shard, seq_no, offset, n_tokens) when packing on
    report.json one line of driver-side counters (also printed)

No ``master``/executor sizing here — spark-submit owns it (crawl_job's
contract).  Every stage keeps the pipeline's scale shape: no all-pairs
joins, no driver data rows beyond the report counters.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="eget_spark curation job")
    p.add_argument("--input", required=True,
                   help="parquet path of crawled docs (doc_id, text, ...)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--languages", nargs="*", default=None)
    p.add_argument("--min-quality", type=float, default=0.0)
    p.add_argument("--max-stopword-ratio", type=float, default=None)
    p.add_argument("--min-entropy", type=float, default=None)
    p.add_argument("--gopher-rules", action="store_true")
    p.add_argument("--min-flesch", type=float, default=None)
    p.add_argument("--no-near-dup", action="store_true")
    p.add_argument("--near-dup-threshold", type=float, default=0.85)
    p.add_argument("--best-representative", action="store_true")
    p.add_argument("--scrub-pii", action="store_true")
    p.add_argument("--chunker", default="semantic",
                   choices=["semantic", "sentence"])
    p.add_argument("--split-by", default=None,
                   help="group column for leakage-safe train/val/test")
    p.add_argument("--pack-capacity", type=int, default=None,
                   help="token capacity per training sequence; enables "
                        "packing output")
    p.add_argument("--pack-shards", type=int, default=16)
    p.add_argument("--out-shards", type=int, default=None,
                   help="striped size-balanced shard column on docs/")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def main(argv: list[str], spark=None) -> int:
    args = parse_args(argv)
    owns_session = spark is None
    if owns_session:
        from pyspark.sql import SparkSession

        b = SparkSession.builder.appName("eget_spark_curate")
        if args.shuffle_partitions:
            b = b.config(
                "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
            )
        b = (
            b.config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
        )
        spark = b.getOrCreate()

    from pyspark.sql import functions as F

    from eget_spark.operators.packing import pack_sequences, striped_shards
    from eget_spark.pipeline import prepare_training_data

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    res = prepare_training_data(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        min_quality=args.min_quality,
        max_stopword_ratio=args.max_stopword_ratio,
        min_entropy=args.min_entropy,
        languages=args.languages,
        near_dup=not args.no_near_dup,
        near_dup_threshold=args.near_dup_threshold,
        gopher_rules=args.gopher_rules,
        min_flesch=args.min_flesch,
        best_representative=args.best_representative,
        scrub_pii=args.scrub_pii,
        chunker=args.chunker,
        split_by=args.split_by,
    )

    # prepare_training_data normalizes the id column to `id` and
    # annotates `n_tokens` — downstream stages build on those.
    # The pipeline DAG (filters + dedup joins + chunker) is the
    # expensive part: persist the survivor table so the shard join,
    # packing, and its report count all reuse one execution, and take
    # every other report counter from the parquet just written instead
    # of re-running the pipeline per count.
    out = args.output.rstrip("/")
    base = res.docs.persist()
    survivors = base
    if args.out_shards:
        sized = base.withColumn(
            "_sz", F.length(F.col(args.text_col)).cast("long")
        )
        shard = striped_shards(
            sized, "id", "_sz", n_shards=args.out_shards
        ).select("id", "shard")
        survivors = base.join(shard, "id")
    survivors.write.mode("overwrite").parquet(f"{out}/docs")
    res.chunks.write.mode("overwrite").parquet(f"{out}/chunks")
    res.dropped.write.mode("overwrite").parquet(f"{out}/dropped")

    n_packed = None
    if args.pack_capacity:
        packed = pack_sequences(
            base.select("id", "n_tokens"), "id", "n_tokens",
            capacity=args.pack_capacity, n_shards=args.pack_shards,
        )
        packed.write.mode("overwrite").parquet(f"{out}/packing")
        n_packed = spark.read.parquet(f"{out}/packing").count()

    drop_rows = (
        spark.read.parquet(f"{out}/dropped")
        .groupBy("reason")
        .count()
        .collect()
    )
    report = {
        "input_docs": docs.count(),
        "surviving_docs": base.count(),
        "chunks": spark.read.parquet(f"{out}/chunks").count(),
        "dropped_by_reason": {r["reason"]: r["count"] for r in drop_rows},
        "packed_rows": n_packed,
        "wall_sec": round(time.time() - t0, 3),
    }
    base.unpersist()
    line = json.dumps(report, sort_keys=True)
    print(line)
    # report.json: single driver-side line next to the data
    spark.createDataFrame([(line,)], "json string").coalesce(1).write.mode(
        "overwrite"
    ).text(f"{out}/report.json")
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
