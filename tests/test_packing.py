from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from eget_spark.operators.packing import pack_sequences


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _pack_oracle(rows, capacity, n_shards, seed):
    """Pure-Python next-fit reference."""
    shards: dict[int, list[tuple[str, int, int]]] = {}
    for doc_id, n in rows:
        k = hashlib.md5((seed + str(doc_id)).encode()).hexdigest()
        shards.setdefault(doc_id % n_shards, []).append((k, doc_id, n))
    out = {}
    for shard, items in shards.items():
        items.sort()
        seq_no, fill = 0, 0
        first = True
        for _, doc_id, n in items:
            if not first and fill + n > capacity:
                seq_no, fill = seq_no + 1, 0
            first = False
            out[doc_id] = (shard, seq_no, fill, n)
            fill += n
    return out


def test_next_fit_semantics(spark):
    # one shard so the order is fully controlled; md5 order scrambles ids
    rows = [(i * 4, t) for i, t in enumerate([60, 60, 60, 30, 90, 100, 10])]
    got = {
        r["doc_id"]: (r["shard"], r["seq_no"], r["offset"], r["n_tokens"])
        for r in pack_sequences(
            _df(spark, rows), "doc_id", "n_tokens", 100, n_shards=4, seed="s"
        ).collect()
    }
    assert got == _pack_oracle(rows, 100, 4, "s")
    # every sequence holding >1 doc respects the capacity
    by_seq: dict[tuple[int, int], int] = {}
    for shard, seq, off, n in got.values():
        by_seq[(shard, seq)] = max(by_seq.get((shard, seq), 0), off + n)
        assert off == 0 or off + n <= 100


def test_oversized_doc_owns_its_sequence(spark):
    rows = [(0, 10), (4, 250), (8, 10)]  # all shard 0 (n_shards=4)
    got = pack_sequences(
        _df(spark, rows), "doc_id", "n_tokens", 100, n_shards=4, seed=""
    ).collect()
    big = [r for r in got if r["n_tokens"] == 250][0]
    assert big["offset"] == 0  # opens its own sequence
    others = {r["seq_no"] for r in got if r["n_tokens"] != 250}
    assert big["seq_no"] not in others


def test_partitioning_invariance(spark):
    rows = [(i, (i * 37) % 120 + 1) for i in range(200)]
    a = pack_sequences(
        _df(spark, rows).repartition(1), "doc_id", "n_tokens", 128, seed="x"
    )
    b = pack_sequences(
        _df(spark, rows).repartition(7, "n_tokens"),
        "doc_id", "n_tokens", 128, seed="x",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() == 200


def test_offsets_are_dense_prefix_sums(spark):
    rows = [(i, (i % 5) * 17 + 3) for i in range(100)]
    got = pack_sequences(
        _df(spark, rows), "doc_id", "n_tokens", 64, n_shards=8, seed="y"
    )
    # within (shard, seq_no), offsets tile the sequence without gaps
    seqs = (
        got.groupBy("shard", "seq_no")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max(F.col("offset") + F.col("n_tokens")).alias("end"),
            F.min("offset").alias("start"),
        )
        .collect()
    )
    for r in seqs:
        assert r["start"] == 0 and r["end"] == r["tot"]


# --- striped size-balanced shards --------------------------------------------


def _py_striped(rows, n_shards):
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    return {rid: i % n_shards for i, (rid, _) in enumerate(order)}


def test_striped_shards_match_python_oracle(spark):
    from eget_spark.operators.packing import shard_stats, striped_shards

    rows = [(i, (i * 37) % 11 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, nbytes long")
    got = {
        r["id"]: r["shard"]
        for r in striped_shards(df, "doc_id", "nbytes", 4).collect()
    }
    assert got == _py_striped(rows, 4)


def test_striped_shards_balance_bound(spark):
    """Striping by size rank keeps shard totals within one top-band item
    of each other on a size-skewed input."""
    from eget_spark.operators.packing import shard_stats, striped_shards

    rows = [(i, 2 ** (i % 12)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, nbytes long")
    assigned = striped_shards(df, "doc_id", "nbytes", 5)
    stats = {r["shard"]: r["total_size"] for r in shard_stats(assigned).collect()}
    assert set(stats) == set(range(5))
    sizes = sorted(r[1] for r in rows)
    assert max(stats.values()) - min(stats.values()) <= sizes[-1]
    # nothing lost: totals add up
    assert sum(stats.values()) == sum(r[1] for r in rows)


def test_striped_shards_tie_break_by_id(spark):
    from eget_spark.operators.packing import striped_shards

    rows = [(i, 100) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, nbytes long")
    got = {
        r["id"]: r["shard"]
        for r in striped_shards(df, "doc_id", "nbytes", 3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 0, 4: 1, 5: 2}
