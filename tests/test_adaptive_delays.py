"""Latency-adaptive politeness (operators/politeness.adaptive_delays)."""

from eget_spark.operators.politeness import adaptive_delays


def _log(spark, rows):
    return spark.createDataFrame(rows, "host string, latency_ms long")


def test_delay_formula_and_clamps(spark):
    rows = [
        ("fast", 10), ("fast", 20),          # avg 15 -> 30 -> clamp 100
        ("mid", 300), ("mid", 500),          # avg 400 -> 800
        ("slow", 9000), ("slow", 9000),      # 18000 -> clamp 10000
    ]
    out = {r["host"]: r.asDict() for r in adaptive_delays(_log(spark, rows)).collect()}
    assert out["fast"]["delay_ms"] == 100
    assert out["mid"]["delay_ms"] == 800
    assert out["slow"]["delay_ms"] == 10000
    assert out["mid"]["n_fetches"] == 2


def test_floor_division(spark):
    rows = [("h", 101), ("h", 100), ("h", 100)]  # avg 100.333 -> 200.67 -> 200
    out = adaptive_delays(_log(spark, rows)).collect()[0]
    assert out["delay_ms"] == 200


def test_mult_and_bounds_overridable(spark):
    out = adaptive_delays(
        _log(spark, [("h", 50)]), mult=4, min_ms=10, max_ms=150
    ).collect()[0]
    assert out["delay_ms"] == 150
