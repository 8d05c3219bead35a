"""Cluster entrypoint: corpus-health analytics report via spark-submit
(the monitoring companion to jobs/crawl_job.py and jobs/curate_job.py —
run it between crawl rounds or before shipping a curated snapshot).

    zip -r /tmp/eget_spark.zip eget_spark
    spark-submit --py-files /tmp/eget_spark.zip jobs/analytics_job.py \
        --input  hdfs://.../crawled_docs_parquet \
        --output hdfs://.../health_run_01 \
        --group-col source --id-col doc_id --text-col text \
        --size-col n_chars --shuffle-partitions 2048

Composes the oracle-verified health operators end-to-end, each writing
its own parquet under --output plus one driver-side report.json line:

    richness/     q264 Yule/Herdan/Guiraud lexical richness per group
    divergence/   q249 per-group KL/CE vs the corpus mixture
    jsd/          q263 pairwise group Jensen-Shannon matrix
    benford/      q255 leading-digit forensic audit of --size-col
    readability/  q260 Fog/SMOG/Coleman-Liau per document
    diversity/    q244 Shannon/Simpson source-diversity indices
    tail/         q274 Hill tail index of --size-col
    kanon/        q273 k-anonymity census over (group, lang, size bucket)

All stages keep the engine's scale shape — map-side-combined aggregates,
broadcast scalars, no all-pairs joins, no driver data rows beyond the
report counters.  No ``master``/executor sizing here — spark-submit owns
it (the crawl_job contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="eget_spark analytics job")
    p.add_argument("--input", required=True,
                   help="parquet path of docs (doc_id, text, ...)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--group-col", default="source")
    p.add_argument("--lang-col", default=None,
                   help="optional language column for the k-anonymity "
                        "quasi-identifier tuple")
    p.add_argument("--size-col", default=None,
                   help="numeric size column for Benford/Hill; computed "
                        "as length(text) when absent")
    p.add_argument("--hill-k", type=int, default=100)
    p.add_argument("--anon-k", type=int, default=5)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def main(argv: list[str], spark=None) -> int:
    args = parse_args(argv)
    owns_session = spark is None
    if owns_session:
        from pyspark.sql import SparkSession

        b = SparkSession.builder.appName("eget_spark_analytics")
        if args.shuffle_partitions:
            b = b.config(
                "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
            )
        b = b.config("spark.sql.session.timeZone", "UTC").config(
            "spark.sql.execution.arrow.pyspark.enabled", "true"
        )
        spark = b.getOrCreate()

    from pyspark.sql import functions as F

    from eget_spark.operators.audit import (
        benford_digit_audit,
        k_anonymity_audit,
    )
    from eget_spark.operators.corpus_stats import (
        hill_tail_index,
        lexical_richness,
    )
    from eget_spark.operators.divergence import (
        group_divergences,
        pairwise_jsd,
    )
    from eget_spark.operators.fairness import diversity_indices
    from eget_spark.functions.text import readability_indices

    t0 = time.monotonic()
    docs = spark.read.parquet(args.input)
    if args.size_col:
        docs = docs.withColumn("_size", F.col(args.size_col).cast("long"))
    else:
        docs = docs.withColumn(
            "_size", F.length(F.col(args.text_col)).cast("long")
        )
    docs = docs.persist()

    out = args.output.rstrip("/")
    report: dict = {"input": args.input, "output": out}

    richness = lexical_richness(docs, args.group_col, args.text_col)
    richness.write.mode("overwrite").parquet(f"{out}/richness")
    report["n_groups"] = spark.read.parquet(f"{out}/richness").count()

    div = group_divergences(docs, args.group_col, args.text_col)
    div.write.mode("overwrite").parquet(f"{out}/divergence")

    jsd = pairwise_jsd(docs, args.group_col, args.text_col)
    jsd.write.mode("overwrite").parquet(f"{out}/jsd")
    jsd_read = spark.read.parquet(f"{out}/jsd")
    report["n_group_pairs"] = jsd_read.count()
    twin = jsd_read.orderBy("jsd_micro").limit(1).collect()
    if twin:
        report["closest_pair"] = [
            twin[0]["grp_a"], twin[0]["grp_b"], twin[0]["jsd_micro"]
        ]

    benford = benford_digit_audit(docs, args.group_col, "_size")
    benford.write.mode("overwrite").parquet(f"{out}/benford")

    readability = readability_indices(docs, args.id_col, args.text_col)
    readability.write.mode("overwrite").parquet(f"{out}/readability")

    diversity = diversity_indices(docs, args.group_col)
    diversity.write.mode("overwrite").parquet(f"{out}/diversity")

    tail = hill_tail_index(docs, "_size", k=args.hill_k)
    tail.write.mode("overwrite").parquet(f"{out}/tail")
    t_row = spark.read.parquet(f"{out}/tail").collect()
    if t_row:
        report["hill_alpha"] = t_row[0]["alpha"]

    quasi = [args.group_col]
    if args.lang_col:
        quasi.append(args.lang_col)
    docs_b = docs.withColumn("_size_bucket", F.expr("_size DIV 100"))
    kanon = k_anonymity_audit(docs_b, quasi + ["_size_bucket"],
                              k=args.anon_k)
    kanon.write.mode("overwrite").parquet(f"{out}/kanon")
    k_row = spark.read.parquet(f"{out}/kanon").collect()[0]
    report["k_anonymity"] = k_row["k_anonymity"]
    report["suppress_ppm"] = k_row["suppress_ppm"]

    report["n_docs"] = docs.count()
    report["wall_sec"] = round(time.monotonic() - t0, 2)
    docs.unpersist()

    line = json.dumps(report, sort_keys=True)
    print(line)
    # report.json via the driver (one line — not a distributed write)
    try:
        import os

        if not out.startswith(("hdfs://", "s3://", "s3a://", "gs://")):
            os.makedirs(out, exist_ok=True)
            with open(f"{out}/report.json", "w") as fh:
                fh.write(line + "\n")
    except OSError:
        pass
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
