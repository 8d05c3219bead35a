"""D1: Bloom filter correctness — no false negatives ever; anti-join with
bloom pre-filter is exactly equal to the exact anti-join."""

from __future__ import annotations

from eget_spark.operators.seen import BloomFilter, anti_join_seen, build_bloom


def test_bloom_no_false_negatives(spark):
    urls = [f"https://h{i % 7}.example.com/p/{i:05d}" for i in range(2000)]
    df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(8)
    bloom = build_bloom(df, "url", expected=2000, fpp=0.01)
    assert all(bloom.contains(u) for u in urls)
    fp = sum(bloom.contains(f"https://other/{i}") for i in range(2000))
    assert fp < 2000 * 0.05  # fpp honored within slack


def test_bloom_merge_equals_single_build():
    a, b = BloomFilter.sized(100, 0.01), BloomFilter.sized(100, 0.01)
    a.add_many([f"u{i}" for i in range(50)])
    b.add_many([f"u{i}" for i in range(50, 100)])
    a.merge(b)
    assert all(a.contains(f"u{i}") for i in range(100))


def test_anti_join_with_bloom_equals_exact(spark):
    cand = spark.createDataFrame(
        [(f"u{i}",) for i in range(500)], "url string"
    ).repartition(4)
    seen = spark.createDataFrame(
        [(f"u{i}",) for i in range(0, 500, 3)], "url string"
    ).repartition(4)
    # high fpp to force the exact-confirm path to do real work
    bloom = build_bloom(seen, "url", expected=64, fpp=0.3)
    exact = {r["url"] for r in cand.join(seen, "url", "left_anti").collect()}
    with_bloom = {
        r["url"] for r in anti_join_seen(cand, seen, "url", bloom=bloom).collect()
    }
    assert with_bloom == exact


def test_bloom_delta_like_build(spark):
    """Per-round delta path: build_bloom(like=) yields a merge-compatible
    filter; merged result contains base+delta with no driver URL collection."""
    base = spark.createDataFrame([(f"a{i}",) for i in range(300)], "url string")
    delta = spark.createDataFrame([(f"b{i}",) for i in range(300)], "url string")
    bloom = build_bloom(base, "url", expected=4096, fpp=0.01)
    d = build_bloom(delta, "url", like=bloom)
    assert (d.m_bits, d.k) == (bloom.m_bits, bloom.k)
    bloom.merge(d)
    assert all(bloom.contains(f"a{i}") for i in range(300))
    assert all(bloom.contains(f"b{i}") for i in range(300))


def test_bloom_vectorized_matches_scalar():
    bf = BloomFilter.sized(500, 0.01)
    vals = [f"u{i}" for i in range(200)]
    bf.add_many(vals)
    import numpy as np

    got = bf.contains_many(vals + ["nope", None])
    assert got[:200].all()
    assert not got[-1]  # None -> False
    assert bool(got[200]) == bf.contains("nope")


def test_bloom_broadcast_cached_until_mutation(spark):
    bf = BloomFilter.sized(100, 0.01)
    bf.add_many(["x"])
    b1 = bf.spark_broadcast(spark)
    b2 = bf.spark_broadcast(spark)
    assert b1 is b2  # no rebroadcast between mutations (verdict fix #8)
    bf.add_many(["y"])
    b3 = bf.spark_broadcast(spark)
    assert b3 is not b1
