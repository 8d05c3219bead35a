"""Bucketed-corpus co-located fetch join: the corpus side must scan with
no Exchange when the corpus table is bucketed on the join key."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from eget_spark.plans.tables import write_bucketed_corpus


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_bucketed_corpus_join_skips_corpus_exchange(spark, docs_small):
    corpus = docs_small.select("doc_id", "host", "spans")
    table = write_bucketed_corpus(corpus, "corpus_bucketed_t", buckets=8)
    # same files, read WITHOUT bucket metadata -> the unbucketed baseline
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED corpus_bucketed_t")
        .where("col_name = 'Location'")
        .first()["data_type"]
    )
    plain = spark.read.parquet(loc)
    ids = [r["doc_id"] for r in corpus.limit(50).collect()]
    frontier = spark.createDataFrame([(i,) for i in ids], "url string")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = _plan(table.join(frontier, table["doc_id"] == frontier["url"]))
        baseline = _plan(plain.join(frontier, plain["doc_id"] == frontier["url"]))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # baseline shuffles BOTH sides; the bucketed corpus side reads in
    # bucket order so only the frontier-side exchange remains
    assert "Bucketed: true" in bucketed
    assert _n_exchanges(baseline) == 2
    assert _n_exchanges(bucketed) == 1

    # identical results either way
    got = sorted(
        r["doc_id"]
        for r in table.join(frontier, table["doc_id"] == frontier["url"]).collect()
    )
    assert got == sorted(ids)
