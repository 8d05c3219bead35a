"""Streaming incremental host-health counters == batch q285/q289 over
the union (streaming/health.py), any arrival order; replay idempotent;
additive (NOT re-observation-idempotent) by contract."""

from eget_spark.operators.fdr import host_failure_fdr
from eget_spark.operators.shrinkage import beta_binomial_shrink
from eget_spark.streaming.health import (
    health_stream,
    process_health_batch,
    read_health_counters,
    read_live_fdr,
    read_live_shrinkage,
)

SCHEMA = "host string, success long"


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _corpus():
    rows = []
    for i in range(600):
        host = f"h{i % 10}"
        bad = i % 10 >= 8
        fail = (i * 2654435761) % 1000 < (250 if bad else 30)
        rows.append((host, 0 if fail else 1))
    return rows


def test_stream_health_equals_batch_any_order(spark, tmp_path):
    rows = _corpus()
    batches = [rows[400:][::-1], rows[150:400][::-1], rows[:150][::-1]]
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
    q = health_stream(stream, state, "host", "success")
    q.awaitTermination()

    union = _rows_df(spark, rows)
    fails = union.selectExpr("host", "1 - success AS fail")

    # 1. live FDR screen == batch q285 over the union, bit-equal
    assert _rows(read_live_fdr(spark, state)) == _rows(
        host_failure_fdr(fails, "host", "fail")
    )
    # and the bad hosts are the live discoveries
    live = {
        r["key"]
        for r in read_live_fdr(spark, state).where("discovery").collect()
    }
    assert live == {"h8", "h9"}

    # 2. live shrinkage == batch q289 over the union, bit-equal
    assert _rows(read_live_shrinkage(spark, state)) == _rows(
        beta_binomial_shrink(union, "host", "success")
    )


def test_replay_idempotent(spark, tmp_path):
    rows = _corpus()
    state = str(tmp_path / "state")
    b0, b1 = rows[:300], rows[300:]
    process_health_batch(_rows_df(spark, b0), 0, state)
    process_health_batch(_rows_df(spark, b1), 1, state)
    before = _rows(read_health_counters(spark, state))
    # crash-replay of epoch 1 overwrites its own directory
    process_health_batch(_rows_df(spark, b1), 1, state)
    assert _rows(read_health_counters(spark, state)) == before
    # and the counters equal one batch aggregate over the union
    union = _rows_df(spark, rows)
    want = _rows(
        union.groupBy("host").agg(
            {"*": "count", "success": "sum"}
        ).selectExpr(
            "host AS key",
            "CAST(`count(1)` AS BIGINT) AS n",
            "CAST(`sum(success)` AS BIGINT) AS successes",
        )
    )
    assert before == want


def test_additive_not_reobservation_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    rows = [("h0", 1), ("h0", 0)]
    process_health_batch(_rows_df(spark, rows), 0, state)
    process_health_batch(_rows_df(spark, rows), 1, state)
    got = _rows(read_health_counters(spark, state))
    assert got == [("h0", 4, 2)]  # counted twice, by contract
