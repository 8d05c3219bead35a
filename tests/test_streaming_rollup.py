"""Streaming continuous aggregate == batch rollup (streaming/rollup.py)."""

import datetime

from eget_spark.operators.rollup import rollup_events
from eget_spark.streaming.rollup import read_rollup, rollup_stream


def _write_events(spark, path, rows, part):
    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), k, v)
         for i, (s, k, v) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, key string, value double",
    )
    df.write.mode("append").parquet(f"{path}/batch={part}")


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    rows1 = [((i * 700) % 7200, f"k{i % 2}", i / 4.0) for i in range(30)]
    rows2 = [((i * 433) % 7200, f"k{i % 3}", i / 8.0) for i in range(25)]
    _write_events(spark, src, rows1, 0)
    _write_events(spark, src, rows2, 1)

    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, key string, value double"
        )
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .option("basePath", src)
        .parquet(f"{src}/batch=*")
    )
    q = rollup_stream(stream, state, "key", "ts", "value")
    q.awaitTermination()

    batch = rollup_events(
        spark.read.option("basePath", src).parquet(f"{src}/batch=*"),
        "key", "ts", "value",
    )
    got = sorted(map(tuple, read_rollup(spark, state).collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want

    # exactly-once on restart: re-running the drained stream is a no-op
    q2 = rollup_stream(
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, key string, value double"
        ).option("basePath", src).parquet(f"{src}/batch=*"),
        state, "key", "ts", "value",
    )
    q2.awaitTermination()
    assert sorted(map(tuple, read_rollup(spark, state).collect())) == want


def test_rollup_replay_same_epoch_is_idempotent(spark, tmp_path):
    """Replaying a micro-batch with its own epoch id (what Structured
    Streaming does after a crash before the epoch commit) rebuilds that
    version from the PRIOR state — never double-merges the batch."""
    from eget_spark.streaming.rollup import process_rollup_batch

    src = str(tmp_path / "events")
    rows1 = [((i * 700) % 7200, "k0", 1.0) for i in range(10)]
    rows2 = [((i * 433) % 7200, "k0", 2.0) for i in range(8)]
    _write_events(spark, src, rows1, 0)
    _write_events(spark, src, rows2, 1)
    state = str(tmp_path / "state")
    b1 = spark.read.parquet(f"{src}/batch=0")
    b2 = spark.read.parquet(f"{src}/batch=1")
    process_rollup_batch(b1, 0, state, "key", "ts", "value")
    process_rollup_batch(b2, 1, state, "key", "ts", "value")
    want = sorted(map(tuple, read_rollup(spark, state).collect()))
    # crash-replay of epoch 1: state must be unchanged
    process_rollup_batch(b2, 1, state, "key", "ts", "value")
    assert sorted(map(tuple, read_rollup(spark, state).collect())) == want
    # and even a replay of epoch 0 leaves the LATEST version correct
    process_rollup_batch(b1, 0, state, "key", "ts", "value")
    assert sorted(map(tuple, read_rollup(spark, state).collect())) == want
