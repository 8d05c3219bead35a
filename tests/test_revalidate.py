"""HTTP conditional revalidation (operators/recrawl.revalidate)."""

from eget_spark.operators.recrawl import revalidate

SCHEMA = "url string, etag string, last_modified long"


def _run(spark, cached, live):
    c = spark.createDataFrame(cached, SCHEMA)
    v = spark.createDataFrame(live, SCHEMA)
    return {r["url"]: r["action"] for r in revalidate(c, v).collect()}


def test_etag_precedence_over_last_modified(spark):
    # ETags equal but LM newer: ETag wins -> not_modified (RFC 9110)
    out = _run(
        spark,
        [("u1", "abc", 100), ("u2", "abc", 100)],
        [("u1", "abc", 999), ("u2", "xyz", 100)],
    )
    assert out == {"u1": "not_modified", "u2": "modified"}


def test_last_modified_fallback(spark):
    out = _run(
        spark,
        [("u1", None, 100), ("u2", None, 100)],
        [("u1", None, 100), ("u2", None, 101)],
    )
    assert out == {"u1": "not_modified", "u2": "modified"}


def test_gone_and_refetch(spark):
    out = _run(
        spark,
        [("gone", "e", 1), ("noval", None, None), ("half", "e", None)],
        [("noval", None, None), ("half", None, 5)],
    )
    # cached has etag but live lost it, and cached has no LM -> refetch
    assert out == {"gone": "gone", "noval": "refetch", "half": "refetch"}


def test_mixed_validator_asymmetry(spark):
    # cached LM only, live has both: LM path applies (no cached etag)
    out = _run(spark, [("u", None, 50)], [("u", "e", 49)])
    assert out == {"u": "not_modified"}
