"""End-to-end spark-submit face: jobs/healthcheck_job.py over a
synthetic fetch ledger — every output table lands, the report carries
the headline numbers, and per-table contents agree with the operators
invoked directly (the job is composition, not re-implementation)."""

from __future__ import annotations

import json
import sys


def _ledger_rows():
    rows = []
    for i in range(1200):
        host = f"h{i % 12}"
        tier = f"t{(i % 12) % 3}"
        # hosts h10/h11 fail hard; everyone else near the 3% SLA
        bad = i % 12 >= 10
        fail = (i * 2654435761) % 1000 < (250 if bad else 30)
        # tier-shifted latency with a drifting host h0
        lat = 100 + (i * 7) % 11 + 4 * ((i % 12) % 3)
        if i % 12 == 0 and i >= 600:
            lat += 40
        rows.append((host, i, lat, 0 if fail else 1, tier))
    return rows


def test_healthcheck_job_end_to_end(spark, tmp_path):
    sys.path.insert(0, ".")
    from jobs.healthcheck_job import main

    src = str(tmp_path / "ledger")
    spark.createDataFrame(
        _ledger_rows(),
        "host string, ts long, latency_ms long, success long, tier string",
    ).write.parquet(src)

    out = str(tmp_path / "health")
    rc = main(
        [
            "--input", src,
            "--output", out,
            "--tier-col", "tier",
        ],
        spark=spark,
    )
    assert rc == 0

    report = json.loads(open(f"{out}/report.json").read())
    assert report["n_fetches"] == 1200
    assert report["n_hosts"] == 12
    assert report["n_tiers"] == 3

    # the two bad hosts are the discoveries, nobody else
    fdr = spark.read.parquet(f"{out}/fdr")
    found = {r["key"] for r in fdr.where("discovery").collect()}
    assert found == {"h10", "h11"}
    assert report["n_discoveries"] == 2

    # the drifting host alarms under CUSUM
    cusum = spark.read.parquet(f"{out}/cusum")
    drifted = {r["key"] for r in cusum.where("drifted").collect()}
    assert "h0" in drifted
    assert report["n_drifted"] == cusum.where("drifted").count()

    # tier latency shift is significant under KW (exact df=2 p)
    assert report["kruskal_h"] > 9.21 and report["kruskal_p_ppm"] < 10_000

    # per-table parity with direct operator invocation
    from eget_spark.operators.shrinkage import beta_binomial_shrink

    ledger = spark.read.parquet(src)
    direct = {
        r["key"]: r["shrunk_ppm"]
        for r in beta_binomial_shrink(ledger, "host", "success").collect()
    }
    written = {
        r["key"]: r["shrunk_ppm"]
        for r in spark.read.parquet(f"{out}/shrinkage").collect()
    }
    assert written == direct

    wilson = spark.read.parquet(f"{out}/wilson")
    assert wilson.count() == 12
