"""Bounded per-URL fetch retries (CrawlConfig.max_retries — the SURVEY
§2 mapping of the reference's tenacity x3 retry: per-URL re-enqueue next
round, bounded)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.plans.crawl import CrawlConfig, crawl

_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _corpus(spark):
    def link(url, off):
        return ("link", "anchor", url, off)  # target rides in media_ref (X1)

    def text(t, off):
        return ("text", t, "", off)

    a, b, dead = (
        "http://h0.example.com/0",
        "http://h0.example.com/1",
        "http://h0.example.com/dead",
    )
    rows = [
        (a, [text("root page", 0), link(b, 1), link(dead, 2)]),
        (b, [text("leaf page", 0)]),
        # `dead` is linked but absent from the corpus -> a permanent miss
    ]
    return spark.createDataFrame(rows, _DDL), a, b, dead


def test_retries_reattempt_and_emit_one_missing_row(spark):
    docs, a, b, dead = _corpus(spark)
    cfg = CrawlConfig(
        seed_urls=[a], max_depth=3, max_pages=100,
        respect_robots_txt=False, max_retries=2,
    )
    res = crawl(spark, docs, cfg, robots=None)
    # the dead URL is attempted in rounds 2, 3, 4 (admission + 2 retries):
    # attempted totals are 1 (seed), 2 (b + dead), 1 (retry), 1 (retry)
    assert [s.attempted for s in res.stats] == [1, 2, 1, 1]
    assert [s.failed for s in res.stats] == [0, 1, 1, 1]
    # exactly ONE missing page row, at the LAST attempt round
    miss = res.pages.where(F.col("status") == "missing").collect()
    assert len(miss) == 1 and miss[0]["url"] == dead and miss[0]["round"] == 4
    # ok pages and seen set are unaffected by the retry machinery
    assert {r["url"] for r in res.pages.where("status = 'ok'").collect()} == {a, b}
    assert res.seen.count() == 3


def test_retries_off_matches_previous_single_attempt_behavior(spark):
    docs, a, b, dead = _corpus(spark)
    cfg = CrawlConfig(
        seed_urls=[a], max_depth=3, max_pages=100, respect_robots_txt=False,
    )
    res = crawl(spark, docs, cfg, robots=None)
    assert [s.attempted for s in res.stats] == [1, 2]
    miss = res.pages.where(F.col("status") == "missing").collect()
    assert len(miss) == 1 and miss[0]["url"] == dead and miss[0]["round"] == 2


def test_retries_table_mode_emits_missing_once_after_exhaustion(spark, tmp_path):
    docs, a, b, dead = _corpus(spark)
    cfg = CrawlConfig(
        seed_urls=[a], max_depth=3, max_pages=100,
        respect_robots_txt=False, max_retries=1,
    )
    res = crawl(spark, docs, cfg, robots=None, table_dir=str(tmp_path / "run"))
    miss = res.pages.where(F.col("status") == "missing").collect()
    assert len(miss) == 1 and miss[0]["url"] == dead and miss[0]["round"] == 3
    # retry attempts are visible in the stats trail
    assert [s.attempted for s in res.stats] == [1, 2, 1]
