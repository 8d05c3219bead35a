"""Streaming face: crawl-round parquet appends drive incremental queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.plans.crawl import CrawlConfig, crawl
from eget_spark.streaming.rounds import (
    chunk_stream,
    run_available_now,
    stream_crawled_docs,
    streaming_round_stats,
)
from eget_spark.synth import doc_url


def test_streaming_stats_and_chunks(spark, docs_small, robots_small, tmp_path):
    d = str(tmp_path / "run")
    cfg = CrawlConfig(seed_urls=[doc_url(0, 0)], max_depth=2, max_pages=40)
    res = crawl(spark, docs_small, cfg, robots=robots_small, table_dir=d)

    agg = streaming_round_stats(stream_crawled_docs(spark, d))
    run_available_now(agg, "round_stats")
    got = {
        (r["round"], r["status"]): r["n"]
        for r in spark.sql("SELECT * FROM round_stats").collect()
    }
    want = {}
    for r in res.pages.groupBy("round", "status").count().collect():
        want[(r["round"], r["status"])] = r["count"]
    assert got == want

    out = str(tmp_path / "chunks")
    q = chunk_stream(spark, d, out)
    q.awaitTermination()
    chunks = spark.read.parquet(out)
    ok_docs = res.pages.where(F.col("status") == "ok").count()
    assert chunks.select("doc_id").distinct().count() <= ok_docs
    assert chunks.count() >= 0  # chunker may drop header-only docs (quirk)
    # exactly-once: re-running the stream adds nothing
    q2 = chunk_stream(spark, d, out)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == chunks.count()
