"""Accent folding + dedup normalization (functions/text)."""

import pyspark.sql.functions as F

from eget_spark.functions.text import ACCENT_DST, ACCENT_SRC, dedup_normalize, fold_accents


def _one(spark, col_fn, s):
    return spark.createDataFrame([(s,)], "t string").select(
        col_fn(F.col("t")).alias("o")
    ).collect()[0]["o"]


def test_map_is_one_to_one():
    assert len(ACCENT_SRC) == len(ACCENT_DST)
    assert len(set(ACCENT_SRC)) == len(ACCENT_SRC)
    assert all("a" <= c <= "z" for c in ACCENT_DST)


def test_fold_accents_basic(spark):
    assert _one(spark, fold_accents, "Crème BRÛLÉE à Zürich") == "creme brulee a zurich"
    # pinned 1:1 fold: ü->u and ø->o (not German-convention ue/oe);
    # only the æ/œ/ß specials expand to two chars
    assert _one(spark, fold_accents, "Grüße, Œuvre, Ærø") == "grusse, oeuvre, aero"


def test_fold_extended_a(spark):
    assert _one(spark, fold_accents, "Łódź ćwiczenia ĞŊŧ") == "lodz cwiczenia gnt"


def test_dedup_normalize_collapses_variants(spark):
    a = _one(spark, dedup_normalize, "  Hello,   World!!  ")
    b = _one(spark, dedup_normalize, "héllo wörld")
    assert a == b == "hello world"


def test_normalized_twins_hash_equal(spark):
    df = spark.createDataFrame(
        [(1, "The Quick—Brown Fox."), (2, "thé qüick brown FOX")],
        "id long, text string",
    )
    keys = df.select(F.md5(dedup_normalize(F.col("text"))).alias("k")).distinct()
    assert keys.count() == 1
