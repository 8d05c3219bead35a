"""Streaming incremental host graph == batch collapse_to_hosts
(streaming/hostgraph.py), any arrival order; replay idempotent; weighted
rank over the drained graph == rank over the batch graph."""

from eget_spark.operators.graph import collapse_to_hosts
from eget_spark.streaming.hostgraph import (
    hostgraph_stream,
    process_hostgraph_batch,
    read_host_graph,
)

SCHEMA = "src_host string, dst_host string"


def _edges(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _corpus():
    rows = []
    for i in range(12):
        rows.append((f"h{i % 3}", f"h{(i + 1) % 4}"))
        rows.append((f"h{i % 4}", f"h{i % 4}"))  # self-loops must drop
    rows.append(("h9", "h0"))
    return rows


def test_stream_hostgraph_equals_batch_any_order(spark, tmp_path):
    rows = _corpus()
    # adversarial split: duplicated pairs scattered across batches, reversed
    batches = [rows[15:][::-1], rows[7:15][::-1], rows[:7][::-1]]
    src = str(tmp_path / "edges")
    for b, rs in enumerate(batches):
        _edges(spark, rs).coalesce(1).write.mode("append").parquet(
            f"{src}/batch={b}"
        )
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src)
        .parquet(f"{src}/batch=*")
    )
    q = hostgraph_stream(stream, state)
    q.awaitTermination()

    got = _rows(read_host_graph(spark, state))
    want = _rows(collapse_to_hosts(_edges(spark, rows)))
    assert got == want and len(got) > 0


def test_stream_hostgraph_replay_idempotent(spark, tmp_path):
    rows = _corpus()
    state = str(tmp_path / "state")
    process_hostgraph_batch(_edges(spark, rows[:10]), 0, state)
    process_hostgraph_batch(_edges(spark, rows[10:]), 1, state)
    once = _rows(read_host_graph(spark, state))
    # crash-replay of epoch 1 overwrites its own dir — no double count
    process_hostgraph_batch(_edges(spark, rows[10:]), 1, state)
    assert _rows(read_host_graph(spark, state)) == once


def test_rank_over_drained_graph_matches_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from eget_spark.operators.graph import pagerank_weighted_fixed

    rows = _corpus()
    state = str(tmp_path / "state")
    process_hostgraph_batch(_edges(spark, rows[:9]), 0, state)
    process_hostgraph_batch(_edges(spark, rows[9:]), 1, state)
    drained = read_host_graph(spark, state).localCheckpoint()
    batch = collapse_to_hosts(_edges(spark, rows)).localCheckpoint()
    nodes = spark.createDataFrame(
        [(f"h{i}",) for i in range(10)], "id string"
    )
    a = {
        r["id"]: r["pr_fp"]
        for r in pagerank_weighted_fixed(nodes, drained, n_iter=3).collect()
    }
    b = {
        r["id"]: r["pr_fp"]
        for r in pagerank_weighted_fixed(nodes, batch, n_iter=3).collect()
    }
    assert a == b
