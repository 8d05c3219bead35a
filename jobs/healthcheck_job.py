"""Cluster entrypoint: per-host statistical health screening via
spark-submit (the INFERENCE companion to jobs/analytics_job.py — that
job audits corpus CONTENT; this one decides which HOSTS are sick, from
the fetch ledger the crawl itself emits).

    zip -r /tmp/eget_spark.zip eget_spark
    spark-submit --py-files /tmp/eget_spark.zip jobs/healthcheck_job.py \
        --input  hdfs://.../fetch_ledger_parquet \
        --output hdfs://.../health_run_02 \
        --host-col host --ts-col ts --latency-col latency_ms \
        --success-col success --tier-col tier \
        --sla-fail-ppm 30000 --alpha-ppm 50000 \
        --shuffle-partitions 2048

Input schema: one row per fetch attempt with (host, ts, latency,
success 0/1) and optionally a tier label.  Composes the
oracle-verified inference operators end-to-end, each writing its own
parquet under --output plus one driver-side report.json line:

    fdr/        q285 BH-FDR discoveries over per-host failure z-tests
                (which hosts may be throttled at a bounded innocent
                fraction)
    shrinkage/  q289 empirical-Bayes beta-binomial posterior rates
                (what to RANK small-n hosts by)
    wilson/     q278 per-host Wilson success intervals
    cusum/      q254 per-host latency CUSUM drift alarms
    kruskal/    q293 Kruskal-Wallis latency test across tiers (emitted
                only when --tier-col has >= 2 tiers; exact p for odd
                tier counts)

All stages keep the engine's scale shape — one map-side-combined
groupBy(host) each, host-bounded downstream tables, broadcast scalars,
no driver data rows beyond the report counters.  No ``master``/executor
sizing here — spark-submit owns it (the crawl_job contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="eget_spark host healthcheck")
    p.add_argument("--input", required=True,
                   help="parquet path of the fetch ledger")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--host-col", default="host")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--latency-col", default="latency_ms")
    p.add_argument("--success-col", default="success")
    p.add_argument("--tier-col", default=None,
                   help="optional tier label for the cross-tier "
                        "Kruskal-Wallis latency test")
    p.add_argument("--sla-fail-ppm", type=int, default=30_000,
                   help="SLA failure rate the z-tests screen against")
    p.add_argument("--alpha-ppm", type=int, default=50_000,
                   help="BH false-discovery budget")
    p.add_argument("--cusum-slack", type=int, default=10,
                   help="CUSUM reference = global median latency + slack")
    p.add_argument("--cusum-threshold", type=int, default=60)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def main(argv: list[str], spark=None) -> int:
    args = parse_args(argv)
    owns_session = spark is None
    if owns_session:
        from pyspark.sql import SparkSession

        b = SparkSession.builder.appName("eget_spark_healthcheck")
        if args.shuffle_partitions:
            b = b.config(
                "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
            )
        b = b.config("spark.sql.session.timeZone", "UTC").config(
            "spark.sql.execution.arrow.pyspark.enabled", "true"
        )
        spark = b.getOrCreate()

    from pyspark.sql import functions as F

    from eget_spark.operators.drift import cusum_drift, kruskal_wallis
    from eget_spark.operators.drift import wilson_intervals
    from eget_spark.operators.fdr import host_failure_fdr
    from eget_spark.operators.shrinkage import beta_binomial_shrink

    t0 = time.monotonic()
    ledger = spark.read.parquet(args.input).persist()
    out = args.output.rstrip("/")
    report: dict = {"input": args.input, "output": out}

    fails = ledger.select(
        F.col(args.host_col).alias("host"),
        (1 - F.col(args.success_col).cast("long")).alias("fail"),
    )
    fdr = host_failure_fdr(
        fails, "host", "fail",
        p0_ppm=args.sla_fail_ppm, alpha_ppm=args.alpha_ppm,
    )
    fdr.write.mode("overwrite").parquet(f"{out}/fdr")
    fdr_read = spark.read.parquet(f"{out}/fdr")
    report["n_hosts"] = fdr_read.count()
    report["n_discoveries"] = fdr_read.where("discovery").count()

    shrink = beta_binomial_shrink(ledger, args.host_col, args.success_col)
    shrink.write.mode("overwrite").parquet(f"{out}/shrinkage")

    wilson = wilson_intervals(ledger, args.host_col, args.success_col)
    wilson.write.mode("overwrite").parquet(f"{out}/wilson")

    # CUSUM reference from the global median latency (one scalar) —
    # approxQuantile at relErr 0 is the exact median, driver-bounded
    med = int(
        ledger.select(F.col(args.latency_col).cast("long").alias("v"))
        .approxQuantile("v", [0.5], 0.0)[0]
    )
    series = ledger.select(
        F.col(args.host_col).alias("host"),
        F.col(args.ts_col).alias("ts"),
        F.col(args.latency_col).cast("long").alias("value"),
    )
    cusum = cusum_drift(
        series, "host", "ts", "value",
        k=med + args.cusum_slack, h=args.cusum_threshold,
    )
    cusum.write.mode("overwrite").parquet(f"{out}/cusum")
    report["cusum_reference"] = med + args.cusum_slack
    report["n_drifted"] = (
        spark.read.parquet(f"{out}/cusum").where("drifted").count()
    )

    if args.tier_col:
        tiers = sorted(
            r[0]
            for r in ledger.select(args.tier_col).distinct().collect()
        )
        if len(tiers) >= 2:
            kw = kruskal_wallis(
                ledger.select(
                    F.col(args.tier_col).alias("tier"),
                    F.col(args.latency_col).cast("long").alias("value"),
                ),
                "tier", "value", tiers,
            )
            kw.write.mode("overwrite").parquet(f"{out}/kruskal")
            k_row = spark.read.parquet(f"{out}/kruskal").collect()[0]
            report["kruskal_h"] = k_row["h"]
            report["kruskal_p_ppm"] = k_row["p_ppm"]
            report["n_tiers"] = len(tiers)

    report["n_fetches"] = ledger.count()
    report["wall_sec"] = round(time.monotonic() - t0, 2)
    ledger.unpersist()

    line = json.dumps(report, sort_keys=True)
    print(line)
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
