"""rel=canonical collapse (operators/canonical.canonical_collapse)."""

from eget_spark.operators.canonical import canonical_collapse


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, canonical_url string")


def test_self_canonical_target_wins(spark):
    rows = [
        ("https://a.org/p/1?ref=x", None),  # the target itself (query noise)
        ("https://a.org/p/1-print", "https://a.org/p/1"),
        ("https://a.org/p/1-amp", "https://a.org/p/1#top"),  # fragment noise
        ("https://a.org/other", None),
    ]
    out = {r["url"]: r.asDict() for r in canonical_collapse(_pages(spark, rows)).collect()}
    assert out["https://a.org/p/1-print"]["representative"] == "https://a.org/p/1?ref=x"
    assert out["https://a.org/p/1-amp"]["canonical_key"] == "https://a.org/p/1"
    assert out["https://a.org/p/1?ref=x"]["is_representative"]
    assert out["https://a.org/p/1?ref=x"]["cluster_size"] == 3
    assert out["https://a.org/other"]["cluster_size"] == 1
    assert out["https://a.org/other"]["is_representative"]


def test_absent_target_falls_back_to_min_url(spark):
    rows = [
        ("https://b.org/z", "https://b.org/target"),
        ("https://b.org/a", "https://b.org/target"),
    ]
    out = canonical_collapse(_pages(spark, rows)).collect()
    reps = {r["representative"] for r in out}
    assert reps == {"https://b.org/a"}  # lexicographic min, deterministic


def test_blank_declaration_ignored(spark):
    rows = [("https://c.org/x?q=1", "   "), ("https://c.org/x?q=2", "")]
    out = {r["url"]: r.asDict() for r in canonical_collapse(_pages(spark, rows)).collect()}
    # blank canonicals fall back to own normalized URL — and the two
    # variants share it (query stripped), so they collapse together
    assert out["https://c.org/x?q=1"]["canonical_key"] == "https://c.org/x"
    assert out["https://c.org/x?q=1"]["cluster_size"] == 2


def test_every_page_in_exactly_one_cluster(spark):
    rows = [
        (f"https://d.org/p/{i}", f"https://d.org/p/{i % 3}" if i % 2 else None)
        for i in range(20)
    ]
    out = canonical_collapse(_pages(spark, rows))
    assert out.count() == 20
    assert out.select("url").distinct().count() == 20
