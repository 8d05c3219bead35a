"""Streaming incremental novelty == batch ngram_novelty
(streaming/novelty.py)."""

from pyspark.sql import functions as F

from eget_spark.operators.novelty import doc_grams, ngram_novelty
from eget_spark.streaming.novelty import (
    novelty_stream,
    process_novelty_batch,
    read_gram_state,
    read_novelty_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_novelty_equals_batch(spark, tmp_path):
    src = str(tmp_path / "docs")
    batch1 = [(0, "a b c d e"), (1, "a b c x y"), (2, "p q r s t")]
    batch2 = [(3, "a b c d e"), (4, "x y z w v"), (5, "tiny")]
    _docs(spark, batch1).coalesce(1).write.mode("append").parquet(f"{src}/batch=0")
    _docs(spark, batch2).coalesce(1).write.mode("append").parquet(f"{src}/batch=1")

    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src)
        .parquet(f"{src}/batch=*")
    )
    q = novelty_stream(stream, state, "id", "text", n=3)
    q.awaitTermination()

    all_docs = _docs(spark, batch1 + batch2)
    got = _rows(read_novelty_scores(spark, state))
    want = _rows(
        ngram_novelty(all_docs, "id", "text", 3).select(
            "id", "n_grams", "n_novel", "novelty_permille"
        )
    )
    assert got == want
    # doc 3 repeats doc 0 exactly -> 0 novelty, scored in its own batch
    by_id = {r[0]: r for r in got}
    assert by_id[3][3] == 0
    # drained gram state == batch first-seen table
    got_state = _rows(read_gram_state(spark, state).select("gram", "first_id"))
    want_state = _rows(
        doc_grams(all_docs, "id", "text", 3)
        .groupBy("gram")
        .agg(F.min("id").alias("first_id"))
    )
    assert got_state == want_state


def test_novelty_batch_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = _docs(spark, [(0, "a b c d"), (1, "a b c d")])
    b1 = _docs(spark, [(2, "a b c z")])
    process_novelty_batch(b0, 0, state, "id", "text", 3)
    process_novelty_batch(b1, 1, state, "id", "text", 3)
    before_scores = _rows(read_novelty_scores(spark, state))
    before_state = _rows(read_gram_state(spark, state))
    # a mid-epoch crash replays the LAST micro-batch: same epoch id
    process_novelty_batch(b1, 1, state, "id", "text", 3)
    assert _rows(read_novelty_scores(spark, state)) == before_scores
    assert _rows(read_gram_state(spark, state)) == before_state
