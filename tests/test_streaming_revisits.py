"""Streaming incremental revisit ledger == batch revisit_dedup
(streaming/revisits.py), any arrival order; replay idempotent; the
per-capture assignment re-derived from the drained ledger is
bit-identical to the batch operator."""

from eget_spark.sources.warc import revisit_dedup
from eget_spark.streaming.revisits import (
    assign_from_ledger,
    process_revisit_batch,
    read_revisit_ledger,
    revisit_stream,
)

SCHEMA = "url string, payload binary, fetch_time long"


def _caps(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _corpus():
    """Recrawl history with unchanged pages (revisits), changed pages
    (two digests per URL), and a page whose ORIGINAL arrives in a later
    batch than one of its revisits (the retroactive-min case)."""
    rows = []
    for i in range(6):
        body = f"page-{i}".encode()
        for t in range(1 + i % 3):  # 1..3 identical captures
            rows.append((f"http://a.example/{i}", body, 100 + 10 * t + i))
    rows.append(("http://a.example/0", b"page-0-v2", 500))  # content change
    rows.append(("http://a.example/0", b"page-0-v2", 560))  # then revisit
    rows.append(("http://late.example/x", b"late", 900))  # revisit ...
    rows.append(("http://late.example/x", b"late", 50))  # ... original later
    rows.append(("http://err.example/f", None, 70))  # failed fetch: NULL
    rows.append(("http://err.example/f", None, 80))  # payload, NULL digest
    return rows


def test_stream_ledger_equals_batch_any_order(spark, tmp_path):
    rows = _corpus()
    # adversarial split: the late.example ORIGINAL (t=50) lands in the
    # final batch, after its revisit (t=900) was already drained
    batches = [rows[:5][::-1], rows[5:12][::-1], rows[12:][::-1]]
    src = str(tmp_path / "caps")
    for b, rs in enumerate(batches):
        _caps(spark, rs).coalesce(1).write.mode("append").parquet(
            f"{src}/batch={b}"
        )
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src)
        .parquet(f"{src}/batch=*")
    )
    q = revisit_stream(stream, state)
    q.awaitTermination()

    ledger = read_revisit_ledger(spark, state).localCheckpoint()
    # ledger == batch ledger computed directly over all captures
    import pyspark.sql.functions as F

    batch_led = (
        _caps(spark, rows)
        .groupBy("url", F.sha2("payload", 256).alias("digest"))
        .agg(
            F.min("fetch_time").alias("first_time"),
            F.count(F.lit(1)).cast("long").alias("n_captures"),
            F.max(F.octet_length("payload").cast("long")).alias(
                "payload_bytes"
            ),
        )
        .withColumn(
            "saved_bytes",
            ((F.col("n_captures") - 1) * F.col("payload_bytes")).cast("long"),
        )
    )
    assert _rows(ledger) == _rows(batch_led) and ledger.count() > 0

    # per-capture assignment from the drained ledger == batch operator
    got = assign_from_ledger(_caps(spark, rows), ledger)
    want = revisit_dedup(_caps(spark, rows))
    assert _rows(got) == _rows(want)
    # the retroactive-min case really exercises the merge: the t=900
    # capture must be a revisit referring to t=50
    late = {r.fetch_time: r for r in got.where("url like '%late%'").collect()}
    assert late[900].record_type == "revisit" and late[900].refers_to == 50
    assert late[50].record_type == "response" and late[50].stored_bytes == 4


def test_stream_ledger_replay_idempotent(spark, tmp_path):
    rows = _corpus()
    state = str(tmp_path / "state")
    process_revisit_batch(_caps(spark, rows[:7]), 0, state)
    process_revisit_batch(_caps(spark, rows[7:]), 1, state)
    once = _rows(read_revisit_ledger(spark, state))
    # crash-replay of epoch 1 overwrites its own dir — no double count
    process_revisit_batch(_caps(spark, rows[7:]), 1, state)
    assert _rows(read_revisit_ledger(spark, state)) == once


def test_ledger_saved_bytes_accounting(spark, tmp_path):
    # 3 identical captures of a 10-byte payload: 1 stored, 2 saved
    rows = [("http://s.example/p", b"0123456789", t) for t in (1, 2, 3)]
    state = str(tmp_path / "state")
    process_revisit_batch(_caps(spark, rows[:1]), 0, state)
    process_revisit_batch(_caps(spark, rows[1:]), 1, state)
    led = read_revisit_ledger(spark, state).collect()
    assert len(led) == 1
    r = led[0]
    assert r.n_captures == 3 and r.payload_bytes == 10 and r.saved_bytes == 20
    assert r.first_time == 1
