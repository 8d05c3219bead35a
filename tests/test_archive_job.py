"""Cluster entrypoint smoke (jobs/archive_job.py): captures -> revisit
dedup -> WARC member files -> surt-sorted CDX -> ZipNum blocks, one JSON
report — in-process against the shared session."""

from __future__ import annotations

import json
import math


def _mk_captures(spark):
    rows = []
    for i in range(30):
        url = f"https://w{i % 5}.example.org/page/{i}"
        body = f"<html><body>doc {i} body text</body></html>"
        rows.append((url, body.encode(), 1000 + i))
        if i % 3 == 0:  # unchanged recrawl -> revisit record
            rows.append((url, body.encode(), 2000 + i))
        if i % 7 == 0:  # changed recrawl -> second original
            rows.append((url, (body + "!").encode(), 3000 + i))
    return spark.createDataFrame(
        rows, "url string, payload binary, fetch_time long"
    )


def test_archive_job_end_to_end(spark, tmp_path, capsys):
    from jobs.archive_job import main

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    caps = _mk_captures(spark)
    caps.write.parquet(inp)

    rc = main(
        ["--input", inp, "--output", out, "--warc-shards", "3",
         "--block-size", "7", "--sitemap-base",
         "https://archive.example/maps", "--sitemap-shard-size", "4"],
        spark=spark,
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    n_caps = caps.count()
    n_revisits = caps.count() - caps.select("url", "payload").distinct().count()
    n_originals = n_caps - n_revisits
    assert report["captures"] == n_caps
    assert report["originals"] == n_originals
    assert report["revisits"] == n_revisits

    hist = spark.read.parquet(f"{out}/revisits")
    assert hist.count() == n_caps
    # revisit rows store zero bytes and point at the original's timestamp
    rev = hist.where(hist.record_type == "revisit").collect()
    assert len(rev) == n_revisits
    assert all(r["stored_bytes"] == 0 and r["refers_to"] is not None for r in rev)

    cdx = spark.read.parquet(f"{out}/cdx")
    assert cdx.count() == report["cdx_rows"] == n_originals
    # every CDX row's byte range round-trips to the parsed record
    one = cdx.limit(1).collect()[0]
    assert one["rec_len"] > 0 and one["rec_offset"] >= 0
    assert one["surt"].startswith("org,example,")

    blocks = spark.read.parquet(f"{out}/zipnum")
    assert blocks.count() == report["zipnum_blocks"] == math.ceil(n_originals / 7)
    # front-coding never stores more than raw
    assert all(
        b["stored_chars"] <= b["raw_chars"] for b in blocks.collect()
    )

    files = spark.read.parquet(f"{out}/warc")
    assert files.count() == report["warc_files"] <= 3
    assert files.agg({"n_records": "sum"}).collect()[0][0] == n_originals


def test_archive_job_sitemap_output(spark, tmp_path, capsys):
    import math
    import os

    from eget_spark.sources.sitemaps import parse_sitemap_xml
    from jobs.archive_job import main

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    caps = _mk_captures(spark)
    caps.write.parquet(inp)
    rc = main(
        ["--input", inp, "--output", out, "--sitemap-base",
         "https://archive.example/maps", "--sitemap-shard-size", "4"],
        spark=spark,
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_urls = caps.select("url").distinct().count()
    want_shards = math.ceil(n_urls / 4)
    assert report["sitemap_shards"] == want_shards
    idx = parse_sitemap_xml(open(f"{out}/sitemaps/sitemapindex.xml").read())
    assert len(idx) == want_shards
    assert all(
        e["loc"].startswith("https://archive.example/maps/sitemap-")
        for e in idx
    )
    seen = []
    for f in sorted(os.listdir(f"{out}/sitemaps")):
        if f.startswith("sitemap-"):
            seen += [
                e["loc"]
                for e in parse_sitemap_xml(open(f"{out}/sitemaps/{f}").read())
            ]
    want = sorted(r.url for r in caps.select("url").distinct().collect())
    assert sorted(seen) == want
