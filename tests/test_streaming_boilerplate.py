"""Streaming incremental boilerplate templates == batch host_templates
(streaming/boilerplate.py), any arrival order; replay idempotent."""

from eget_spark.operators.boilerplate import host_templates
from eget_spark.streaming.boilerplate import (
    boilerplate_stream,
    process_boilerplate_batch,
    read_templates,
)

SCHEMA = "host string, doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _corpus():
    rows = []
    for i in range(8):
        rows.append(
            ("a.com", i, f"NAV MENU\nunique a {i}\nfooter (c) a.com")
        )
    for i in range(8, 12):
        rows.append(("b.com", i, f"only {i} lines\nhere {i}"))
    rows.append(("c.com", 12, "too few\npages"))
    return rows


def test_stream_templates_equal_batch_any_order(spark, tmp_path):
    rows = _corpus()
    # adversarial split: a host's pages scattered across batches,
    # REVERSED id order (the additive contract needs no ordering)
    batches = [rows[10:][::-1], rows[5:10][::-1], rows[:5][::-1]]
    src = str(tmp_path / "docs")
    for b, rs in enumerate(batches):
        _docs(spark, rs).coalesce(1).write.mode("append").parquet(
            f"{src}/batch={b}"
        )
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src)
        .parquet(f"{src}/batch=*")
    )
    q = boilerplate_stream(stream, state)
    q.awaitTermination()

    got = _rows(read_templates(spark, state, frac=0.5, min_pages=5))
    want = _rows(
        host_templates(_docs(spark, rows), frac=0.5, min_pages=5)
    )
    assert got == want
    hosts = {t[0] for t in got}
    assert hosts == {"a.com"}  # b/c below min_pages
    lines = {t[1] for t in got}
    assert lines == {"NAV MENU", "footer (c) a.com"}


def test_replay_idempotent(spark, tmp_path):
    rows = _corpus()
    state = str(tmp_path / "state")
    process_boilerplate_batch(_docs(spark, rows[:6]), 0, state)
    process_boilerplate_batch(_docs(spark, rows[6:]), 1, state)
    before = _rows(read_templates(spark, state, frac=0.5, min_pages=5))
    # crash-replay epoch 1: same batch, same epoch id -> no state change
    process_boilerplate_batch(_docs(spark, rows[6:]), 1, state)
    after = _rows(read_templates(spark, state, frac=0.5, min_pages=5))
    assert before == after
