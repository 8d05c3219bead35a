"""Asymmetric shingle-containment dedup (operators/dedup.containment_pairs)."""

from eget_spark.operators.dedup import containment_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_short_doc_inside_long_doc(spark):
    short = "alpha beta gamma delta epsilon"
    long = short + " zeta eta theta iota kappa " + "filler " * 30
    out = containment_pairs(
        _df(spark, [(1, short), (2, long)]), "id", "text", threshold=0.9
    ).collect()
    assert len(out) == 1
    r = out[0]
    # every shingle of the short doc appears in the long one
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment_a"] == 1.0
    assert r["containment_b"] < 0.5  # Jaccard-style symmetry would miss it


def test_threshold_filters_either_direction(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b c d e x y z w v u t s r q p o n m l"),
        (3, "completely different words entirely here"),
    ]
    out = containment_pairs(_df(spark, rows), "id", "text", threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(1, 2)}


def test_python_oracle_exact(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox sleeps all day long today",
        3: "quick brown fox jumps",
        4: "one two three four five six seven",
    }

    def grams(t, k=3):
        w = t.lower().split()
        if len(w) < k:
            return {" ".join(w)}
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    expect = {}
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            inter = len(grams(texts[i]) & grams(texts[j]))
            if not inter:
                continue
            ca = round(inter / len(grams(texts[i])), 6)
            cb = round(inter / len(grams(texts[j])), 6)
            if ca >= 0.3 or cb >= 0.3:
                expect[(i, j)] = (ca, cb)

    out = containment_pairs(
        _df(spark, list(texts.items())), "id", "text", threshold=0.3
    ).collect()
    got = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in out
    }
    assert got == expect


def test_max_df_drops_hot_shingles(spark):
    # "x y z" appears in every doc; with max_df=2 it leaves the index,
    # so docs sharing ONLY that shingle produce no pair
    rows = [
        (1, "x y z unique one alpha"),
        (2, "x y z unique two beta"),
        (3, "x y z unique three gamma"),
    ]
    full = containment_pairs(
        _df(spark, rows), "id", "text", threshold=0.01
    ).count()
    gated = containment_pairs(
        _df(spark, rows), "id", "text", threshold=0.01, max_df=2
    ).count()
    assert full == 3 and gated == 0
