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


def test_hreflang_clusters_xdefault_and_fallback(spark):
    from eget_spark.operators.canonical import hreflang_clusters

    links = spark.createDataFrame(
        [
            # cluster A: en<->de<->default, x-default planted
            ("a-en", "a-de", "de"), ("a-en", "a-x", "x-default"),
            ("a-de", "a-en", "en"),
            # cluster B: chain, NO x-default -> min member wins
            ("b-1", "b-2", "en"), ("b-2", "b-3", "de"),
            # cluster C: two x-defaults (conflicting) -> min target pinned
            ("c-1", "c-x2", "X-DEFAULT"), ("c-2", "c-x1", "x-default"),
            ("c-1", "c-2", "en"),
        ],
        "url string, alt_url string, hreflang string",
    )
    got = {r["url"]: (r["cluster_id"], r["canonical_url"])
           for r in hreflang_clusters(links).collect()}
    assert got["a-en"] == ("a-de", "a-x") and got["a-x"] == ("a-de", "a-x")
    assert got["b-1"] == ("b-1", "b-1") and got["b-3"] == ("b-1", "b-1")
    # min x-default target wins; matching is case-insensitive
    assert got["c-1"] == ("c-1", "c-x1") and got["c-x2"] == ("c-1", "c-x1")
    # every url on either side of an edge is a member
    assert len(got) == 10


def test_canonical_chain_masks_unresolved_loops(spark):
    """Composition pin for the q181 chain: a redirect loop's member must
    come out with resolved=False and canonical_key NULL even when its
    hop-cap cut point lands on a real page's id."""
    import pyspark.sql.functions as F

    from eget_spark.operators.redirects import resolve_redirects

    # 0 -> 1 -> 0 loop; 2 terminal; 3 -> 2
    universe = spark.createDataFrame([(i,) for i in range(4)], "id long")
    redirects = spark.createDataFrame(
        [(0, 1), (1, 0), (3, 2)], "src long, dst long"
    )
    res = resolve_redirects(universe, redirects, max_hops=8)
    rows = {r["id"]: (r["final_id"], r["resolved"]) for r in res.collect()}
    assert rows[2] == (2, True) and rows[3] == (2, True)
    assert rows[0][1] is False and rows[1][1] is False
    # the mask rule from q181: canonical_key only for resolved rows
    masked = res.withColumn(
        "ck", F.when(F.col("resolved"), F.col("final_id"))
    )
    got = {r["id"]: r["ck"] for r in masked.collect()}
    assert got[0] is None and got[1] is None and got[2] == 2 and got[3] == 2
