"""Streaming incremental keyed-HLL distinct counter == batch
hll_estimate_by (streaming/hll_distinct.py), any arrival order; replay
idempotent AND re-observation idempotent (max-merge)."""

from pyspark.sql import functions as F

from eget_spark.operators.hll import hll_estimate_by
from eget_spark.streaming.hll_distinct import (
    hll_distinct_stream,
    process_hll_batch,
    read_hll_estimates,
    read_hll_registers,
)

SCHEMA = "host string, url string"


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _corpus():
    rows = []
    for i in range(400):
        rows.append((f"h{i % 5}", f"https://h{i % 5}.example/p/{i % 67}"))
    rows += [("hot", f"https://hot.example/only")] * 50  # hot key, 1 distinct
    return rows


def test_stream_hll_equals_batch_any_order(spark, tmp_path):
    rows = _corpus()
    batches = [rows[300:][::-1], rows[120:300][::-1], rows[:120][::-1]]
    src = str(tmp_path / "fetches")
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
    q = hll_distinct_stream(stream, state, "host", "url", p=8)
    q.awaitTermination()

    got = _rows(read_hll_estimates(spark, state, p=8))
    want = _rows(hll_estimate_by(_rows_df(spark, rows), "host", F.col("url")))
    assert got == want and len(got) == 6
    # the hot single-URL key estimates ~1 regardless of 50 observations
    est = {r[0]: r[4] for r in got}
    assert 0.5 <= est["hot"] <= 2.0


def test_stream_hll_replay_and_reobservation_idempotent(spark, tmp_path):
    rows = _corpus()
    state = str(tmp_path / "state")
    process_hll_batch(_rows_df(spark, rows[:200]), 0, state, "host", "url")
    process_hll_batch(_rows_df(spark, rows[200:]), 1, state, "host", "url")
    once = _rows(read_hll_registers(spark, state))
    # crash-replay of epoch 1 overwrites its own dir
    process_hll_batch(_rows_df(spark, rows[200:]), 1, state, "host", "url")
    assert _rows(read_hll_registers(spark, state)) == once
    # re-observation in a NEW epoch cannot move a max — sketch idempotence
    process_hll_batch(_rows_df(spark, rows[:100]), 2, state, "host", "url")
    assert _rows(read_hll_registers(spark, state)) == once
