"""Range join (operators/rangejoin.range_lookup)."""

import pytest

from eget_spark.operators.rangejoin import range_lookup


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, p long")


def _rng(spark, rows):
    return spark.createDataFrame(rows, "lo long, hi long, tag string")


def test_half_open_and_uncovered(spark):
    pts = _pts(spark, [(1, 5), (2, 10), (3, 99), (4, 100), (5, 500)])
    rng = _rng(spark, [(0, 10, "a"), (10, 100, "b")])
    out = {r["id"]: r["tag"] for r in range_lookup(
        pts, rng, "id", "p", "lo", "hi", ["tag"]).collect()}
    # 10 is hi of a (excluded) and lo of b (included); 100 excluded from b
    assert out == {1: "a", 2: "b", 3: "b", 4: None, 5: None}


def test_narrowest_interval_wins(spark):
    pts = _pts(spark, [(1, 50)])
    rng = _rng(spark, [(0, 1000, "wide"), (40, 60, "narrow"), (45, 55, "tight")])
    out = range_lookup(pts, rng, "id", "p", "lo", "hi", ["tag"]).collect()
    assert out[0]["tag"] == "tight"


def test_bucket_boundary_spanning(spark):
    # interval spans several buckets at width 8; points in each bucket match
    pts = _pts(spark, [(i, v) for i, v in enumerate([7, 8, 15, 16, 23])])
    rng = _rng(spark, [(7, 24, "x")])
    out = range_lookup(pts, rng, "id", "p", "lo", "hi", ["tag"], bucket_width=8)
    assert all(r["tag"] == "x" for r in out.collect())


def test_python_oracle_random(spark):
    lrows = [(i, (i * 29) % 211) for i in range(80)]
    rrows = [((j * 31) % 190, (j * 31) % 190 + 5 + j % 17, f"t{j}") for j in range(20)]
    out = {r["id"]: r["tag"] for r in range_lookup(
        _pts(spark, lrows), _rng(spark, rrows), "id", "p", "lo", "hi",
        ["tag"], bucket_width=16).collect()}
    import hashlib

    for i, p in lrows:
        cands = [
            (hi - lo, lo, hashlib.md5(t.encode()).hexdigest(), t)
            for (lo, hi, t) in rrows
            if lo <= p < hi
        ]
        assert out[i] == (min(cands)[3] if cands else None), (i, p)


def test_empty_and_degenerate_ranges(spark):
    pts = _pts(spark, [(1, 5)])
    rng = _rng(spark, [(5, 5, "empty"), (6, 4, "inverted")])
    out = range_lookup(pts, rng, "id", "p", "lo", "hi", ["tag"]).collect()
    assert out[0]["tag"] is None
    with pytest.raises(ValueError):
        range_lookup(pts, rng, "id", "p", "lo", "hi", ["tag"], bucket_width=0)


def test_overlap_join_basic(spark):
    from eget_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 200, 300)], "lid long, lo long, hi long")
    right = spark.createDataFrame(
        [(10, 50, 150), (11, 90, 210), (12, 400, 500)],
        "rid long, lo long, hi long")
    out = {(r["lid"], r["rid"]): r["overlap"] for r in interval_overlap_join(
        left, right, "lid", "rid", bucket_width=32).collect()}
    # (1,10): [50,100) -> 50; (1,11): [90,100) -> 10; (2,11): [200,210) -> 10
    assert out == {(1, 10): 50, (1, 11): 10, (2, 11): 10}


def test_overlap_join_no_duplicate_pairs_across_buckets(spark):
    from eget_spark.operators.rangejoin import interval_overlap_join

    # both intervals span many buckets at width 8 -> claim-bucket trick
    # must emit the pair exactly once
    left = spark.createDataFrame([(1, 0, 100)], "lid long, lo long, hi long")
    right = spark.createDataFrame([(2, 10, 90)], "rid long, lo long, hi long")
    out = interval_overlap_join(left, right, "lid", "rid", bucket_width=8)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["overlap"] == 80


def test_overlap_join_python_oracle(spark):
    from eget_spark.operators.rangejoin import interval_overlap_join

    lrows = [(i, (i * 23) % 180, (i * 23) % 180 + 5 + i % 30) for i in range(40)]
    rrows = [(j, (j * 31) % 170, (j * 31) % 170 + 8 + j % 20) for j in range(30)]
    left = spark.createDataFrame(lrows, "lid long, lo long, hi long")
    right = spark.createDataFrame(rrows, "rid long, lo long, hi long")
    out = {(r["lid"], r["rid"]): r["overlap"] for r in interval_overlap_join(
        left, right, "lid", "rid", bucket_width=16).collect()}
    expect = {}
    for li, llo, lhi in lrows:
        for rj, rlo, rhi in rrows:
            if llo < rhi and rlo < lhi:
                expect[(li, rj)] = min(lhi, rhi) - max(llo, rlo)
    assert out == expect
