"""OOV-rate stats (functions/text.oov_stats)."""

from eget_spark.functions.text import oov_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_ratio_and_vocab_cut(spark):
    # vocab_size=2: "a" (df 3) and "b" (df 2) make the vocab; "z"/"q" OOV
    rows = [
        (1, "a b a"),
        (2, "a b z"),
        (3, "a q q q"),
    ]
    out = {r["id"]: r.asDict() for r in oov_stats(
        _docs(spark, rows), "id", "text", vocab_size=2).collect()}
    assert out[1]["oov_ratio"] == 0.0
    assert out[2]["oov_ratio"] == round(1 / 3, 6)
    assert out[3]["oov_ratio"] == 0.75
    assert out[2]["n_tokens"] == 3


def test_df_ties_token_asc(spark):
    # all tokens df=1; vocab_size=1 -> lexicographically first ("alpha")
    rows = [(1, "alpha"), (2, "beta"), (3, "gamma")]
    out = {r["id"]: r["oov_ratio"] for r in oov_stats(
        _docs(spark, rows), "id", "text", vocab_size=1).collect()}
    assert out == {1: 0.0, 2: 1.0, 3: 1.0}


def test_empty_doc_pinned_zero(spark):
    out = oov_stats(_docs(spark, [(1, "   ")]), "id", "text").collect()[0]
    assert out["n_tokens"] == 0 and out["oov_ratio"] == 0.0
