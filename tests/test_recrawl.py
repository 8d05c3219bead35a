"""TTL/recrawl flow (plans/crawl.recrawl): the dataflow form of the
reference's 24h Redis cache TTL (cache_service.py:77-99).  With an
unchanged corpus a recrawl must refetch EXACTLY the expired subset, keep
the seen set identical, and reproduce each refetched page's span sequence
bit-for-bit; the cuckoo filter mirror must drop exactly the expired
fingerprints (the delete capability bloom lacks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.plans.crawl import CrawlConfig, crawl, recrawl
from eget_spark.synth import doc_url

SEED = doc_url(0, 0)


def _first_crawl(spark, docs_small, robots_small, **kw):
    cfg = CrawlConfig(seed_urls=[SEED], max_depth=3, max_pages=60, **kw)
    return cfg, crawl(spark, docs_small, cfg, robots=robots_small)


def test_recrawl_refetches_exactly_the_expired_subset(
    spark, docs_small, robots_small
):
    cfg, prior = _first_crawl(spark, docs_small, robots_small)
    # deterministic expiry predicate: every third admitted URL
    expired = prior.order.where(F.col("seq") % 3 == 0).select("url")
    expired_set = {r["url"] for r in expired.collect()}
    assert expired_set  # predicate is non-trivial

    res = recrawl(spark, docs_small, cfg, prior, expired, robots=robots_small)

    refetched = {r["url"] for r in res.pages.collect()}
    assert refetched == expired_set
    # the carried + re-admitted seen set equals the prior one (corpus
    # unchanged: refetched pages discover no unseen links)
    assert {r["url"] for r in res.seen.collect()} == {
        r["url"] for r in prior.seen.collect()
    }
    # refetch admission preserves the prior relative order
    prior_seq = {
        r["url"]: r["seq"] for r in prior.order.collect()
    }
    got = [r["url"] for r in res.order.orderBy("seq").collect()]
    assert got == sorted(expired_set, key=lambda u: prior_seq[u])
    # span sequences of refetched pages are identical to the prior fetch
    a = {
        r["url"]: [tuple(s) for s in r["spans"]]
        for r in prior.pages.where(F.col("status") == "ok").collect()
        if r["url"] in expired_set
    }
    b = {
        r["url"]: [tuple(s) for s in r["spans"]]
        for r in res.pages.where(F.col("status") == "ok").collect()
    }
    assert a == b


def test_recrawl_nothing_expired_is_a_noop(spark, docs_small, robots_small):
    cfg, prior = _first_crawl(spark, docs_small, robots_small)
    empty = prior.order.where(F.lit(False)).select("url")
    res = recrawl(spark, docs_small, cfg, prior, empty, robots=robots_small)
    assert res.pages.count() == 0
    assert {r["url"] for r in res.seen.collect()} == {
        r["url"] for r in prior.seen.collect()
    }


def test_recrawl_discovers_new_links_from_refetched_pages(
    spark, docs_small, robots_small
):
    """Corpus drift: a refetched page that NOW links to a never-seen URL
    triggers normal BFS admission for it (and only it)."""
    cfg, prior = _first_crawl(spark, docs_small, robots_small)
    seed_row = prior.pages.where(F.col("url") == SEED).first()
    new_url = doc_url(0, 4321)
    assert new_url not in {r["url"] for r in prior.seen.collect()}
    # drifted corpus: the seed page gains a link span to new_url, and the
    # new page exists with no outlinks
    link_span = F.array(
        F.struct(
            F.lit("link").alias("kind"),
            F.lit("drifted link").alias("text"),
            F.lit(new_url).alias("media_ref"),
            F.lit(9999).cast("int").alias("offset"),
        )
    )
    drifted = docs_small.withColumn(
        "spans",
        F.when(F.col("doc_id") == SEED, F.concat(F.col("spans"), link_span)).otherwise(
            F.col("spans")
        ),
    )
    drifted = drifted.unionByName(
        drifted.limit(1).select(
            F.lit(new_url).alias("doc_id"),
            F.slice(F.col("spans"), 1, 1).alias("spans"),
            *[F.col(c) for c in drifted.columns if c not in ("doc_id", "spans")],
        ).select(drifted.columns)
    )
    expired = prior.order.where(F.col("url") == SEED).select("url")
    res = recrawl(spark, drifted, cfg, prior, expired, robots=robots_small)
    got = {r["url"] for r in res.pages.collect()}
    assert got == {SEED, new_url}
    assert {r["url"] for r in res.seen.collect()} == {
        r["url"] for r in prior.seen.collect()
    } | {new_url}


def test_expire_from_filter_deletes_exactly_expired(spark, docs_small, robots_small):
    from eget_spark.operators.cuckoo import build_cuckoo, expire_from_filter

    cfg, prior = _first_crawl(spark, docs_small, robots_small)
    cf = build_cuckoo(prior.seen, "url", expected=1000)
    urls = sorted(r["url"] for r in prior.seen.collect())
    assert cf.contains_many(urls).all()
    expired = prior.order.where(F.col("seq") % 3 == 0).select("url")
    n_exp = expired.count()
    assert expire_from_filter(cf, expired, "url") == n_exp
    exp_set = {r["url"] for r in expired.collect()}
    kept = [u for u in urls if u not in exp_set]
    # no false negatives for survivors; expired may only linger as FPs
    assert cf.contains_many(kept).all()
    fp = int(cf.contains_many(sorted(exp_set)).sum())
    assert fp <= max(1, n_exp // 10)  # 16-bit fps: collisions are rare

    # end-to-end: recrawl driving the filter expiry produces the same
    # refetch set as the exact path
    res = recrawl(
        spark, docs_small, cfg, prior, expired, robots=robots_small, seen_cuckoo=cf
    )
    assert {r["url"] for r in res.pages.collect()} == exp_set


def test_seed_frontier_df_equals_list_seed_path(spark, docs_small, robots_small):
    """The distributed seed path (windowed dedup + caps + global seq) must
    admit exactly what the driver-list path admits for the same seed
    multiset, order, and caps — duplicates dropped first-occurrence-wins,
    per-host cap in enumeration order, max_pages truncation."""
    from pyspark.sql import functions as F

    seeds = (
        [doc_url(0, i) for i in range(6)]
        + [doc_url(0, 2), doc_url(0, 0)]  # duplicates
        + [doc_url(1, i) for i in range(4)]
        + [doc_url(2, 0)]
    )
    kw = dict(max_depth=0, max_pages=8, max_pages_per_host=3)
    list_res = crawl(
        spark, docs_small, CrawlConfig(seed_urls=seeds, **kw), robots=robots_small
    )
    sf = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds)], "url string, order long"
    )
    df_res = crawl(
        spark,
        docs_small,
        CrawlConfig(seed_urls=["https://unused.example.com/"], **kw),
        robots=robots_small,
        seed_frontier=sf,
    )
    want = [
        (r["seq"], r["url"]) for r in list_res.order.orderBy("seq").collect()
    ]
    got = [(r["seq"], r["url"]) for r in df_res.order.orderBy("seq").collect()]
    assert got == want
    assert {r["url"] for r in df_res.seen.collect()} == {
        r["url"] for r in list_res.seen.collect()
    }


# --- Lincoln-Petersen site-size estimation ------------------------------------


def test_site_size_estimate_matches_python(spark):
    from eget_spark.operators.recrawl import site_size_estimate

    a_rows = [("h1", i) for i in range(6)] + [("h2", i) for i in range(3)]
    b_rows = [("h1", i) for i in range(3, 9)] + [("h2", i) for i in range(10, 12)]
    a = spark.createDataFrame(a_rows, "host string, url long")
    b = spark.createDataFrame(b_rows, "host string, url long")
    got = {
        r["key"]: (r["n_a"], r["n_b"], r["n_common"], r["est_size"])
        for r in site_size_estimate(a, b, "host", "url").collect()
    }
    # h1: n_a=6, n_b=6, overlap {3,4,5} -> est = 36 // 3 = 12
    assert got["h1"] == (6, 6, 3, 12)
    # h2: disjoint samples -> NULL estimate
    assert got["h2"] == (3, 2, 0, None)


def test_site_size_estimate_one_sided_key(spark):
    """A key present in only one sample still reports, est NULL."""
    from eget_spark.operators.recrawl import site_size_estimate

    a = spark.createDataFrame([("only-a", 1)], "host string, url long")
    b = spark.createDataFrame([("only-b", 2)], "host string, url long")
    got = {
        r["key"]: (r["n_a"], r["n_b"], r["n_common"], r["est_size"])
        for r in site_size_estimate(a, b, "host", "url").collect()
    }
    assert got == {"only-a": (1, 0, 0, None), "only-b": (0, 1, 0, None)}


def test_site_size_estimate_dedups_samples(spark):
    """Duplicate (key, id) rows in a sample count once."""
    from eget_spark.operators.recrawl import site_size_estimate

    a = spark.createDataFrame(
        [("h", 1), ("h", 1), ("h", 2)], "host string, url long"
    )
    b = spark.createDataFrame([("h", 1), ("h", 1)], "host string, url long")
    r = site_size_estimate(a, b, "host", "url").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_common"], r["est_size"]) == (2, 1, 1, 2)
