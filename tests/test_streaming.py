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


def test_windowed_throughput_watermark_drops_late(spark, tmp_path):
    """Watermarked sliding windows: finalized windows emit exactly once
    (append mode), and an event older than the watermark is dropped."""
    from eget_spark.streaming.rounds import windowed_host_throughput

    src = str(tmp_path / "wsrc")
    out = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")
    schema = "host string, status string, fetched_at timestamp"
    base = "2026-01-01 00:0{m}:{s:02d}"

    def write_rows(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{name}")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("basePath", src)
            .parquet(f"{src}/*")
        )
        q = (
            windowed_host_throughput(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0) + dt.timedelta(seconds=s)
    # batch 1: events at 1s, 6s push windows; 100s advances watermark to 70s
    write_rows(
        [("a", "ok", t(1)), ("a", "missing", t(6)), ("a", "ok", t(100))],
        "b1",
    )
    run_once()
    # batch 2: 30s is 40s behind the 70s watermark -> dropped;
    # 150s moves the watermark to 120s, closing the 100s event's windows
    write_rows([("a", "ok", t(30)), ("a", "ok", t(150))], "b2")
    run_once()

    got = {
        (r["window_start"].second + r["window_start"].minute * 60, r["fetched"], r["ok"])
        for r in spark.read.parquet(out).where("window_start >= '2025-12-31'").collect()
    }
    # windows of events 1s/6s (5s grid, 10s width) + the 100s event's two
    # windows; nothing from the dropped 30s event
    assert (95, 1, 1) in got and (100, 1, 1) in got
    assert (0, 2, 1) in got  # [0,10): events at 1s(ok) + 6s(missing)
    assert not any(ws in (25, 30) for ws, _, _ in got)


def test_streaming_crawl_seen_equals_batch(spark, docs_small, robots_small, tmp_path):
    """End-to-end streaming crawl face: the duplicate-rich discovery
    stream (fetched urls + recurring parents, one micro-batch per round
    file) through the keyed first-seen dedup must reproduce EXACTLY the
    batch crawl's seen set — stream == batch."""
    from eget_spark.streaming.rounds import streaming_crawl_seen

    d = str(tmp_path / "srun")
    cfg = CrawlConfig(seed_urls=[doc_url(0, 0)], max_depth=3, max_pages=60)
    res = crawl(spark, docs_small, cfg, robots=robots_small, table_dir=d)
    batch_seen = {r["url"] for r in res.seen.collect()}

    streaming_crawl_seen(spark, d, query_name="sc_seen")
    rows = spark.sql("SELECT host, url, overflow FROM sc_seen").collect()
    stream_seen = {r["url"] for r in rows}
    # exactly-once: no URL emitted twice, none flagged overflow
    assert len(rows) == len(stream_seen)
    assert not any(r["overflow"] for r in rows)
    assert stream_seen == batch_seen
