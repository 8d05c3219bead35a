"""Streaming incremental LSH index == batch LSH (streaming/lsh_index.py)."""

from pyspark.sql import functions as F

from eget_spark.operators.dedup import lsh_bucket_table, minhash_lsh_pairs
from eget_spark.streaming.lsh_index import (
    lsh_index_stream,
    read_lsh_index,
    read_lsh_matches,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
FAR = "completely different content about spark physical plans and shuffles"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_stream_index_and_matches_equal_batch(spark, tmp_path):
    src = str(tmp_path / "docs")
    batch1 = [(0, BASE), (1, BASE), (2, FAR)]               # within-batch dup 0/1
    batch2 = [(3, NEAR), (4, FAR), (5, "tiny words here")]  # cross-batch dups
    # one part-file per batch so maxFilesPerTrigger=1 == one micro-batch
    # per logical batch (file order pins the arrival order)
    _docs(spark, batch1).coalesce(1).write.mode("append").parquet(f"{src}/batch=0")
    _docs(spark, batch2).coalesce(1).write.mode("append").parquet(f"{src}/batch=1")

    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src)
        .parquet(f"{src}/batch=*")
    )
    q = lsh_index_stream(stream, state, "id", "text", num_hashes=8, bands=4, k=3)
    q.awaitTermination()

    all_docs = _docs(spark, batch1 + batch2)
    # (a) drained index == batch bucket table of everything seen
    got_idx = sorted(map(tuple, read_lsh_index(spark, state).collect()))
    want_idx = sorted(
        map(tuple, lsh_bucket_table(all_docs, "id", "text", 8, 4, 3).collect())
    )
    assert got_idx == want_idx
    # (b) unordered match pairs == full-corpus LSH pairs, each exactly once
    matches = read_lsh_matches(spark, state).collect()
    got_pairs = sorted(
        (min(r["new_id"], r["index_id"]), max(r["new_id"], r["index_id"]))
        for r in matches
    )
    assert len(got_pairs) == len(set(got_pairs))  # no pair reported twice
    want_pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(all_docs, "id", "text", 8, 4, 3).collect()
    )
    assert got_pairs == want_pairs and (0, 1) in got_pairs
    # within-batch pair reported with the higher id as new; cross-batch
    # pairs report the later batch's member as new
    roles = {(r["new_id"], r["index_id"]) for r in matches}
    assert (1, 0) in roles
    assert all(n >= 3 for n, i in roles if (min(n, i), max(n, i)) != (0, 1))

    # exactly-once on restart: draining again adds nothing
    q2 = lsh_index_stream(
        spark.readStream.schema("id long, text string")
        .option("basePath", src)
        .parquet(f"{src}/batch=*"),
        state, "id", "text", num_hashes=8, bands=4, k=3,
    )
    q2.awaitTermination()
    assert (
        sorted(map(tuple, read_lsh_index(spark, state).collect()))
        == want_idx
    )
    assert read_lsh_matches(spark, state).count() == len(want_pairs)

    # mid-epoch replay safety: replaying the SAME epoch (what Structured
    # Streaming does after a crash before the epoch commit) overwrites
    # that epoch's dirs instead of appending duplicates
    from eget_spark.streaming.lsh_index import process_lsh_batch

    process_lsh_batch(_docs(spark, batch2), 1, state, "id", "text", 8, 4, 3)
    assert (
        sorted(map(tuple, read_lsh_index(spark, state).collect())) == want_idx
    )
    assert read_lsh_matches(spark, state).count() == len(want_pairs)
