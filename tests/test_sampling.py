"""Deterministic stratified sampling invariants."""

from __future__ import annotations

from eget_spark.operators.sampling import stratified_sample


def _rows(df):
    return sorted((r["source"], r["doc_id"]) for r in df.collect())


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 5}") for i in range(200)], "doc_id long, source string"
    )
    a = _rows(stratified_sample(df, "source", 7, "doc_id", seed="x"))
    b = _rows(stratified_sample(df.repartition(13), "source", 7, "doc_id", seed="x"))
    assert a == b  # partitioning-independent
    per = {}
    for s, _ in a:
        per[s] = per.get(s, 0) + 1
    assert per == {f"s{k}": 7 for k in range(5)}
    # different seed -> (almost surely) different selection
    c = _rows(stratified_sample(df, "source", 7, "doc_id", seed="y"))
    assert c != a
    # a group smaller than n keeps all its rows
    small = spark.createDataFrame(
        [(1, "only"), (2, "only")], "doc_id long, source string"
    )
    assert len(_rows(stratified_sample(small, "source", 7, "doc_id"))) == 2


def test_proportional_mix_targets_and_determinism(spark):
    from eget_spark.operators.sampling import proportional_mix

    df = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(100)], "id long, g string"
    )
    out = proportional_mix(df, "g", {"g0": 0.5, "g1": 0.3, "g2": 0.2}, 20, "id")
    counts = {r["g"]: r["n"] for r in out.groupBy("g").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"g0": 10, "g1": 6, "g2": 4}  # g3 dropped entirely
    # deterministic: same rows on re-run
    again = proportional_mix(df, "g", {"g0": 0.5, "g1": 0.3, "g2": 0.2}, 20, "id")
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )
    # undersized stratum contributes everything it has
    tiny = proportional_mix(df, "g", {"g0": 1.0}, 200, "id")
    assert tiny.count() == 25
    # empty weights -> empty result
    assert proportional_mix(df, "g", {}, 20, "id").count() == 0
