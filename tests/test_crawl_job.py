"""Cluster entrypoint smoke (jobs/crawl_job.py): the spark-submit face
runs a crawl, leaves resumable state, and the TTL-recrawl flags refetch
exactly the expired subset — all in-process against the shared session
(main(argv, spark=...) skips session ownership)."""

from __future__ import annotations

import json

from eget_spark.synth import doc_url


def test_crawl_job_then_recrawl(spark, docs_small, robots_small, tmp_path, capsys):
    from jobs.crawl_job import main

    corpus = str(tmp_path / "corpus")
    robots = str(tmp_path / "robots")
    docs_small.write.parquet(corpus)
    robots_small.write.parquet(robots)
    run_dir = str(tmp_path / "run1")
    out1 = str(tmp_path / "pages1")

    rc = main(
        [
            "--corpus", corpus, "--robots", robots,
            "--seeds", doc_url(0, 0),
            "--table-dir", run_dir, "--output", out1,
            "--max-depth", "3", "--max-pages", "60",
        ],
        spark=spark,
    )
    assert rc == 0
    stats1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats1["pages"] > 0 and stats1["seen"] >= stats1["pages"]
    pages1 = spark.read.parquet(out1)

    # TTL recrawl: expire the seed round only
    out2 = str(tmp_path / "pages2")
    rc = main(
        [
            "--corpus", corpus, "--robots", robots,
            "--seeds", doc_url(0, 0),
            "--table-dir", run_dir, "--output", out2,
            "--max-depth", "3", "--max-pages", "60",
            "--recrawl-expired-where", "round <= 1",
        ],
        spark=spark,
    )
    assert rc == 0
    expired = {r["url"] for r in pages1.where("round <= 1").collect()}
    refetched = {r["url"] for r in spark.read.parquet(out2).collect()}
    assert refetched == expired and expired


def test_crawl_job_auto_trap_flags(spark, docs_small, robots_small, tmp_path, capsys):
    """--auto-trap-threshold reaches CrawlConfig: the synth corpus's
    /p/NNNNN family is one template per host, so a tiny min-urls throttles
    admission vs the unthrottled run."""
    from jobs.crawl_job import main

    corpus = str(tmp_path / "corpus")
    robots = str(tmp_path / "robots")
    docs_small.write.parquet(corpus)
    robots_small.write.parquet(robots)

    def run(extra):
        rc = main(
            [
                "--corpus", corpus, "--robots", robots,
                "--seeds", doc_url(0, 0),
                "--max-depth", "4", "--max-pages", "200",
            ] + extra,
            spark=spark,
        )
        assert rc == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    throttled = run(["--auto-trap-threshold", "0.8", "--auto-trap-min-urls", "5"])
    free = run([])
    assert throttled["pages"] < free["pages"]
