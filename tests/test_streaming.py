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


def test_stream_first_seen_exactly_once(spark, tmp_path):
    """applyInPandasWithState D1: duplicates within and ACROSS micro-batches
    (and across query restarts via the checkpoint) emit exactly once."""
    import pandas as pd

    from eget_spark.streaming.seen import stream_first_seen

    src = str(tmp_path / "urls")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "host string, url string"

    def run_batch(rows, batch_dir):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{batch_dir}")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "100")
            .parquet(f"{src}/*")
        )
        q = (
            stream_first_seen(stream, max_state_urls=3)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_batch(
        [("a.x", "u1"), ("a.x", "u1"), ("a.x", "u2"), ("b.x", "u1")], "b1"
    )
    got1 = {(r["host"], r["url"]) for r in spark.read.parquet(out).collect()}
    assert got1 == {("a.x", "u1"), ("a.x", "u2"), ("b.x", "u1")}

    # second run: old dup (dropped via restored state), one new URL,
    # and overflow beyond max_state_urls=3 passes through flagged
    run_batch(
        [("a.x", "u2"), ("a.x", "u3"), ("a.x", "u4"), ("b.x", "u1")], "b2"
    )
    rows = spark.read.parquet(out).collect()
    got2 = {(r["host"], r["url"]) for r in rows}
    assert got2 == {
        ("a.x", "u1"), ("a.x", "u2"), ("a.x", "u3"), ("a.x", "u4"), ("b.x", "u1")
    }
    flags = {(r["host"], r["url"]): r["overflow"] for r in rows}
    assert flags[("a.x", "u4")] is True  # beyond cap: flagged, not dropped
    assert flags[("a.x", "u3")] is False
