"""End-to-end spark-submit face: jobs/analytics_job.py over the test
corpus — every output table lands, the report carries the headline
numbers, and the per-table contents agree with the operators invoked
directly (the job is composition, not re-implementation)."""

from __future__ import annotations

import json
import sys


def test_analytics_job_end_to_end(spark, tmp_path):
    sys.path.insert(0, ".")
    from jobs.analytics_job import main

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "health")
    rc = main(
        [
            "--input", src,
            "--output", out,
            "--group-col", "source",
            "--lang-col", "lang",
            "--hill-k", "20",
        ],
        spark=spark,
    )
    assert rc == 0

    report = json.loads(open(f"{out}/report.json").read())
    docs = spark.read.parquet(src)
    assert report["n_docs"] == docs.count()

    n_groups = docs.select("source").distinct().count()
    assert report["n_groups"] == n_groups
    assert report["n_group_pairs"] == n_groups * (n_groups - 1) // 2

    # per-table parity with the operators invoked directly
    from eget_spark.operators.corpus_stats import lexical_richness

    direct = {
        r["source"]: r["yule_k"]
        for r in lexical_richness(docs, "source", "text").collect()
    }
    written = {
        r["source"]: r["yule_k"]
        for r in spark.read.parquet(f"{out}/richness").collect()
    }
    assert written == direct

    tail = spark.read.parquet(f"{out}/tail").collect()[0]
    assert tail["k"] == 20 and report["hill_alpha"] == tail["alpha"]

    kanon = spark.read.parquet(f"{out}/kanon").collect()[0]
    assert report["k_anonymity"] == kanon["k_anonymity"]
    assert 0 <= report["suppress_ppm"] <= 10**6

    readability = spark.read.parquet(f"{out}/readability")
    assert readability.count() == report["n_docs"]
