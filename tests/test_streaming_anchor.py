"""Streaming incremental anchor-text index == batch anchor_bm25_topk
over the union (streaming/anchor_index.py), any arrival order; replay
idempotent; additive bag semantics by contract."""

from pyspark.sql import functions as F

from eget_spark.operators.search import anchor_bm25_topk
from eget_spark.streaming.anchor_index import (
    anchor_index_stream,
    process_anchor_batch,
    read_anchor_bm25,
    read_anchor_counts,
)

SCHEMA = "target string, anchor string"


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _corpus():
    rows = []
    for i in range(240):
        rows.append(
            (f"https://t/{i % 12}", f"anchor a{i % 5} b{i % 7} text")
        )
    rows += [("https://t/0", "spark homepage link")] * 25
    rows += [("https://t/7", "spark")] * 3
    return rows


def test_stream_anchor_bm25_equals_batch_any_order(spark, tmp_path):
    rows = _corpus()
    batches = [rows[180:][::-1], rows[60:180][::-1], rows[:60][::-1]]
    src = str(tmp_path / "links")
    for b, rs in enumerate(batches):
        _rows_df(spark, rs).coalesce(1).write.mode("append").parquet(
            f"{src}/batch={b}"
        )
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src)
        .parquet(f"{src}/batch=*")
    )
    q = anchor_index_stream(stream, state)
    q.awaitTermination()

    terms = ["spark", "a3"]
    got = _rows(read_anchor_bm25(spark, state, terms, k=20))
    want = _rows(anchor_bm25_topk(_rows_df(spark, rows), terms, k=20))
    assert got == want and got  # non-empty and bit-equal incl. rnk


def test_stream_anchor_replay_idempotent_and_additive(spark, tmp_path):
    rows = _corpus()
    state = str(tmp_path / "state")
    process_anchor_batch(_rows_df(spark, rows[:100]), 0, state)
    process_anchor_batch(_rows_df(spark, rows[100:]), 1, state)
    once = _rows(read_anchor_counts(spark, state))
    # crash-replay of epoch 1 overwrites its own dir -> counted once
    process_anchor_batch(_rows_df(spark, rows[100:]), 1, state)
    assert _rows(read_anchor_counts(spark, state)) == once
    # a new epoch re-observing rows ADDS (bag semantics): total token
    # mass grows by exactly the batch's token count
    process_anchor_batch(_rows_df(spark, rows[:10]), 2, state)
    mass = lambda cells: sum(c for _, _, c in cells)
    batch_tokens = sum(len(a.split()) for _, a in rows[:10])
    assert mass(_rows(read_anchor_counts(spark, state))) == mass(once) + batch_tokens
