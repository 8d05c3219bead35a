"""Streaming incremental change-rate counters == batch
estimate_change_rate (streaming/changerate.py), any arrival order;
replay idempotent; rates from drained counters are bit-equal."""

from eget_spark.operators.recrawl import estimate_change_rate
from eget_spark.streaming.changerate import (
    changerate_stream,
    process_changerate_batch,
    read_change_counts,
    read_change_rates,
)

SCHEMA = "url string, changed boolean"


def _checks(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _corpus():
    """Check logs spanning the estimator's regimes: never-changed
    (X == 0 -> max backoff), always-changed (X == n, finite via +0.5),
    and mixed pages whose observations scatter across batches."""
    rows = []
    for i in range(9):
        url = f"http://h{i % 3}.example/p{i}"
        for c in range(1 + i):
            rows.append((url, (c + i) % 3 == 0 if i % 4 else False))
    rows += [("http://hot.example/x", True)] * 5  # X == n page
    return rows


def test_stream_changerate_equals_batch_any_order(spark, tmp_path):
    rows = _corpus()
    batches = [rows[30:][::-1], rows[12:30][::-1], rows[:12][::-1]]
    src = str(tmp_path / "checks")
    for b, rs in enumerate(batches):
        _checks(spark, rs).coalesce(1).write.mode("append").parquet(
            f"{src}/batch={b}"
        )
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src)
        .parquet(f"{src}/batch=*")
    )
    q = changerate_stream(stream, state)
    q.awaitTermination()

    got = _rows(read_change_rates(spark, state))
    want = _rows(estimate_change_rate(_checks(spark, rows)))
    assert got == want and len(got) > 0


def test_stream_changerate_replay_idempotent(spark, tmp_path):
    rows = _corpus()
    state = str(tmp_path / "state")
    process_changerate_batch(_checks(spark, rows[:20]), 0, state)
    process_changerate_batch(_checks(spark, rows[20:]), 1, state)
    once = _rows(read_change_counts(spark, state))
    process_changerate_batch(_checks(spark, rows[20:]), 1, state)
    assert _rows(read_change_counts(spark, state)) == once


def test_stream_changerate_cadence_tightens_with_changes(spark, tmp_path):
    # the live loop's point: more observed changes -> shorter interval
    state = str(tmp_path / "state")
    rows0 = [("http://a.example/", False)] * 6 + [("http://b.example/", True)]
    rows1 = [("http://b.example/", True)] * 5 + [("http://a.example/", False)]
    process_changerate_batch(_checks(spark, rows0), 0, state)
    process_changerate_batch(_checks(spark, rows1), 1, state)
    got = {r.id: r for r in read_change_rates(spark, state).collect()}
    a, b = got["http://a.example/"], got["http://b.example/"]
    assert a.n_changed == 0 and a.next_interval_sec == 604800  # max backoff
    assert b.n_changed == 6 and b.next_interval_sec < a.next_interval_sec
    assert b.rate_per_day > 0
