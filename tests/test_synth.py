"""Corpus generator: determinism, shape, and parquet roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.synth import SCALES, build_docs, write_corpus


def test_corpus_deterministic_and_shaped(spark, docs_small):
    spec = SCALES["small"]
    assert docs_small.count() == spec.total_docs
    hosts = {r["host"]: r["n"] for r in docs_small.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert hosts["h0.example.com"] == spec.pages_hot  # the skew host
    assert all(v == spec.pages_other for h, v in hosts.items() if h != "h0.example.com")
    # regeneration is bit-identical (seeded per doc, order-independent)
    again = build_docs(spark, "small", n_partitions=3)
    a = docs_small.select("doc_id", F.md5(F.to_json(F.struct("spans"))).alias("h"))
    b = again.select("doc_id", F.md5(F.to_json(F.struct("spans"))).alias("h"))
    assert a.join(b, "doc_id").where(a["h"] != b["h"]).count() == 0
    # offsets strictly 0..n-1 per doc
    bad = docs_small.where(
        F.exists(
            F.expr("arrays_zip(spans, sequence(0, size(spans)-1))"),
            lambda z: z["spans"]["offset"] != z["1"],
        )
    )
    assert bad.count() == 0


def test_write_corpus_roundtrip(spark, tmp_path, docs_small):
    out = str(tmp_path / "corpus")
    write_corpus(spark, out, "small")
    docs = spark.read.parquet(f"{out}/docs")
    robots = spark.read.parquet(f"{out}/robots")
    seeds = spark.read.parquet(f"{out}/seeds")
    assert docs.count() == docs_small.count()
    assert robots.count() == SCALES["small"].n_hosts
    assert seeds.count() == 1
    row = docs.orderBy("doc_id").limit(1).collect()[0]
    want = docs_small.orderBy("doc_id").limit(1).collect()[0]
    assert [s.asDict() for s in row["spans"]] == [s.asDict() for s in want["spans"]]
