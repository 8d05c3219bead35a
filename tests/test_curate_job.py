"""Cluster entrypoint smoke (jobs/curate_job.py): the spark-submit
curation face runs the full prepare_training_data pipeline, writes
docs/chunks/dropped (+packing, +shard column), and prints one JSON
report — in-process against the shared session."""

from __future__ import annotations

import json


def _mk_docs(spark):
    rows = []
    for i in range(40):
        if i % 10 == 0:
            text = "aaaa " * 30  # low-entropy spam
        elif i % 10 == 1:
            text = "the quick brown fox jumps over the lazy dog " * 3
        else:
            text = (
                f"document {i} talks about data systems query engines "
                f"and join strategies variant {i % 7} with enough words "
                "to pass the basic gates comfortably here. "
            ) * 4
        rows.append((i, text, "src%d" % (i % 3)))
    # two exact duplicates of doc 5
    rows.append((100, rows[5][1], "src0"))
    rows.append((101, rows[5][1], "src1"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_curate_job_end_to_end(spark, tmp_path, capsys):
    from jobs.curate_job import main

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _mk_docs(spark).write.parquet(inp)

    rc = main(
        [
            "--input", inp, "--output", out,
            "--min-entropy", "1.0",
            "--chunker", "sentence",
            "--pack-capacity", "64", "--pack-shards", "4",
            "--out-shards", "3",
        ],
        spark=spark,
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["input_docs"] == 42
    assert 0 < report["surviving_docs"] < 42
    assert report["chunks"] >= report["surviving_docs"]
    assert report["packed_rows"] == report["surviving_docs"]
    # dedup: the four identical %10==1 docs keep one (3 dropped) and the
    # two replicas of doc 5 drop (keep-first) -> 5 exact duplicates; the
    # four "aaaa" spam docs fall to the quality/entropy gates
    assert report["dropped_by_reason"]["exact_duplicate"] == 5
    spam_dropped = sum(
        n for r, n in report["dropped_by_reason"].items()
        if r in ("quality_filter", "low_entropy")
    )
    assert spam_dropped == 4
    assert sum(report["dropped_by_reason"].values()) == 42 - report[
        "surviving_docs"
    ]

    docs = spark.read.parquet(f"{out}/docs")
    assert docs.count() == report["surviving_docs"]
    assert "shard" in docs.columns
    shards = {r["shard"] for r in docs.select("shard").distinct().collect()}
    assert shards <= {0, 1, 2}
    packing = spark.read.parquet(f"{out}/packing")
    # every packed sequence respects the 64-token capacity unless a
    # single doc overflows it alone
    from pyspark.sql import functions as F

    over = (
        packing.groupBy("shard", "seq_no")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
        .where((F.col("t") > 64) & (F.col("n") > 1))
        .count()
    )
    assert over == 0
    dropped = spark.read.parquet(f"{out}/dropped")
    assert dropped.count() == 42 - report["surviving_docs"]
    report_line = spark.read.text(f"{out}/report.json").collect()[0][0]
    assert json.loads(report_line) == report
