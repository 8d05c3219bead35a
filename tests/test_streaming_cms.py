"""Streaming incremental count-min sketch == batch build_cms over the
union (streaming/cms.py), any arrival order; replay idempotent; additive
(NOT re-observation-idempotent) by contract."""

from pyspark.sql import functions as F

from eget_spark.operators.cms import build_cms, cms_counts, cms_probe_estimates
from eget_spark.streaming.cms import (
    cms_stream,
    process_cms_batch,
    read_cms_estimates,
    read_cms_sketch,
)

SCHEMA = "host string, url string"


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _corpus():
    rows = []
    for i in range(360):
        rows.append((f"h{i % 9}", f"https://h{i % 9}.example/p/{i}"))
    rows += [("hot.example", f"https://hot.example/p/{i}") for i in range(80)]
    return rows


def test_stream_cms_equals_batch_any_order(spark, tmp_path):
    rows = _corpus()
    batches = [rows[300:][::-1], rows[100:300][::-1], rows[:100][::-1]]
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
    q = cms_stream(stream, state, "host", depth=4, width=64)
    q.awaitTermination()

    union = _rows_df(spark, rows)
    # 1. the merged sketch IS the batch sketch (cell-wise, additive)
    assert _rows(read_cms_sketch(spark, state)) == _rows(
        build_cms(union, "host", depth=4, width=64)
    )
    # 2. estimates through the shared probe arithmetic are bit-equal
    keys = union.select("host").distinct()
    got = _rows(read_cms_estimates(spark, state, keys, "host"))
    want = _rows(
        cms_probe_estimates(build_cms(union, "host"), keys, "host")
    )
    assert got == want and len(got) == 10
    # 3. overestimate contract vs exact counts (and hot key visible)
    exact = {r["host"]: r["cms_n"] for r in cms_counts(union, "host").collect()}
    streamed = dict(got)
    assert streamed == exact  # same sketch -> same min-probe
    assert streamed["hot.example"] >= 80


def test_stream_cms_replay_idempotent_but_additive(spark, tmp_path):
    rows = _corpus()
    state = str(tmp_path / "state")
    process_cms_batch(_rows_df(spark, rows[:180]), 0, state, "host")
    process_cms_batch(_rows_df(spark, rows[180:]), 1, state, "host")
    once = _rows(read_cms_sketch(spark, state))
    # crash-replay of epoch 1 overwrites its own dir -> counted once
    process_cms_batch(_rows_df(spark, rows[180:]), 1, state, "host")
    assert _rows(read_cms_sketch(spark, state)) == once
    # re-observation in a NEW epoch adds (CMS counts observations):
    # total sketch mass grows by depth * |batch| exactly
    process_cms_batch(_rows_df(spark, rows[:50]), 2, state, "host")
    mass = lambda cells: sum(c for _, _, c in cells)
    assert mass(_rows(read_cms_sketch(spark, state))) == mass(once) + 4 * 50
