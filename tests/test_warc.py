"""WARC 1.0 reader/writer (sources/warc.py)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from eget_spark.sources.warc import (
    build_record_bytes,
    build_warc_bytes,
    parse_warc_bytes,
    read_warc,
    write_warc_partitions,
)

RECS = [
    {"url": f"https://h{i % 3}.example.org/p/{i}", "payload": f"body {i} x".encode(),
     "status": 404 if i % 5 == 0 else 200,
     "content_type": "text/plain" if i % 2 else "text/html"}
    for i in range(12)
]


def test_roundtrip_plain_and_gzip_members():
    for gz in (False, True):
        blob = build_warc_bytes(RECS, gzip_members=gz)
        if gz:
            assert blob[:2] == b"\x1f\x8b"
        got = parse_warc_bytes(blob)
        assert len(got) == len(RECS)
        for r, e in zip(got, RECS):
            assert r["url"] == e["url"]
            assert r["status"] == e["status"]
            assert r["content_type"] == e["content_type"]
            assert r["payload"] == e["payload"]


def test_gzip_members_are_independently_seekable():
    # the Common Crawl contract: each record is its own gzip member, so a
    # reader can inflate any single member without the others
    blob = build_warc_bytes(RECS[:3], gzip_members=True)
    first_len = len(gzip.compress(build_record_bytes(
        RECS[0]["url"], RECS[0]["payload"], status=RECS[0]["status"],
        content_type=RECS[0]["content_type"]), mtime=0))
    one = parse_warc_bytes(blob[:first_len])
    assert len(one) == 1 and one[0]["url"] == RECS[0]["url"]


def test_skips_non_response_records_and_lf_only_headers():
    warcinfo = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: <urn:x:1>\r\n"
                b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    lf_resp = (b"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: https://a/b\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\nContent-Length: 44\n\n"
               b"HTTP/1.1 200 OK\nContent-Type: text/html\n\nhi!"
               b"\r\n\r\n")
    got = parse_warc_bytes(warcinfo + lf_resp)
    assert len(got) == 1
    assert got[0]["url"] == "https://a/b" and got[0]["payload"] == b"hi!"
    assert got[0]["status"] == 200


def test_payload_length_is_octet_exact():
    # binary payload with CRLFs and WARC/ inside: Content-Length framing
    # must carve it exactly (no delimiter scanning)
    tricky = b"\r\n\r\nWARC/1.0\r\nnot a record\x00\xff" * 3
    blob = build_warc_bytes([{"url": "https://t/x", "payload": tricky}])
    got = parse_warc_bytes(blob)
    assert len(got) == 1 and got[0]["payload"] == tricky


def test_distributed_roundtrip_preserves_record_set(spark):
    df = spark.createDataFrame(
        [(r["url"], bytearray(r["payload"]), r["status"], r["content_type"])
         for r in RECS],
        "url string, payload binary, status int, ctype string",
    ).repartition(3, "url")
    files = write_warc_partitions(
        df, status_col="status", content_type_col="ctype", gzip_members=True
    )
    assert files.count() <= 3
    parsed = read_warc(files.select(F.col("file_name").alias("path"), "content"))
    got = {
        (r["url"], r["status"], r["content_type"], bytes(r["payload"]))
        for r in parsed.collect()
    }
    assert got == {
        (r["url"], r["status"], r["content_type"], r["payload"]) for r in RECS
    }


def test_sink_bytes_are_partition_set_deterministic(spark):
    df = spark.createDataFrame(
        [(r["url"], bytearray(r["payload"])) for r in RECS],
        "url string, payload binary",
    )
    a = write_warc_partitions(df.repartition(1)).collect()
    b = write_warc_partitions(df.orderBy(F.rand(7)).repartition(1)).collect()
    assert len(a) == len(b) == 1
    assert bytes(a[0]["content"]) == bytes(b[0]["content"])
    assert a[0]["file_name"] == b[0]["file_name"]


def test_offsets_and_lengths_tile_the_file():
    # CDX contract: offsets/lengths from the parser must tile the plain
    # file exactly (each record = rec_len + the 4 trailing CRLF bytes)
    blob = build_warc_bytes(RECS)
    got = parse_warc_bytes(blob)
    pos = 0
    for r in got:
        assert r["offset"] == pos
        assert blob[r["offset"] : r["offset"] + 5] == b"WARC/"
        pos = r["offset"] + r["rec_len"] + 4
    assert pos == len(blob)


def test_offsets_are_inflated_stream_positions_for_gzip():
    # for .warc.gz members the parser's offsets address the INFLATED
    # stream (documented CDX semantics for this reader): same tiling
    blob = build_warc_bytes(RECS[:4], gzip_members=True)
    got = parse_warc_bytes(blob)
    import gzip as _gz
    import io as _io
    inflated = b""
    with _io.BytesIO(blob) as f:
        while True:
            try:
                with _gz.GzipFile(fileobj=f) as g:
                    inflated += g.read()
            except (OSError, EOFError):
                break
            if f.tell() >= len(blob):
                break
    pos = 0
    for r in got:
        assert r["offset"] == pos
        pos = r["offset"] + r["rec_len"] + 4
    assert pos == len(inflated)


def test_revisit_dedup_marks_identical_recaptures(spark):
    import hashlib

    from eget_spark.sources.warc import revisit_dedup

    caps = spark.createDataFrame(
        [
            ("u1", 100, b"alpha"),
            ("u1", 200, b"alpha"),     # unchanged recrawl -> revisit of 100
            ("u1", 300, b"beta"),      # content changed -> new response
            ("u1", 400, b"alpha"),     # reverted to the OLD bytes: same
                                       # (url, digest) as capture 100 ->
                                       # revisit of 100, not of 300
            ("u2", 150, b"alpha"),     # same bytes, different URL: the
                                       # per-URL profile stores it fully
        ],
        "url string, fetch_time long, payload binary",
    )
    rows = {
        (r["url"], r["fetch_time"]): r for r in revisit_dedup(caps).collect()
    }
    assert rows[("u1", 100)]["record_type"] == "response"
    assert rows[("u1", 100)]["refers_to"] is None
    assert rows[("u1", 100)]["stored_bytes"] == 5
    assert rows[("u1", 200)]["record_type"] == "revisit"
    assert rows[("u1", 200)]["refers_to"] == 100
    assert rows[("u1", 200)]["stored_bytes"] == 0
    assert rows[("u1", 300)]["record_type"] == "response"
    assert rows[("u1", 400)]["record_type"] == "revisit"
    assert rows[("u1", 400)]["refers_to"] == 100
    assert rows[("u2", 150)]["record_type"] == "response"
    assert (
        rows[("u1", 100)]["digest"]
        == hashlib.sha256(b"alpha").hexdigest()
    )


def test_revisit_dedup_storage_accounting(spark):
    from pyspark.sql import functions as F

    from eget_spark.sources.warc import revisit_dedup

    caps = spark.createDataFrame(
        [("u", t, b"same-bytes") for t in range(10)],
        "url string, fetch_time long, payload binary",
    )
    agg = (
        revisit_dedup(caps)
        .agg(
            F.sum("stored_bytes").alias("stored"),
            F.sum(F.when(F.col("record_type") == "revisit", 1).otherwise(0)).alias("rv"),
        )
        .collect()[0]
    )
    # 10 identical captures store the payload once
    assert agg["stored"] == len(b"same-bytes")
    assert agg["rv"] == 9


def test_zipnum_blocks_front_coding_matches_python(spark):
    from eget_spark.sources.warc import zipnum_blocks

    keys = [
        "com,example)/a/1", "com,example)/a/2", "com,example)/b",
        "com,example)/b", "org,iana)/", "org,iana)/domains",
        "org,iana)/domains/reserved",
    ]
    df = spark.createDataFrame([(k,) for k in keys], "surt string")
    rows = sorted(
        zipnum_blocks(df, "surt", block_size=3).collect(),
        key=lambda r: r["block_id"],
    )
    ks = sorted(keys)
    blocks: dict[int, list[str]] = {}
    for i, k in enumerate(ks):
        blocks.setdefault(i // 3, []).append(k)

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    for r in rows:
        blk = blocks[r["block_id"]]
        assert r["first_key"] == blk[0]
        assert r["n_keys"] == len(blk)
        assert r["raw_chars"] == sum(len(k) for k in blk)
        stored = sum(
            len(k) - (lcp(blk[i - 1], k) if i else 0)
            for i, k in enumerate(blk)
        )
        assert r["stored_chars"] == stored, r


def test_zipnum_blocks_duplicate_keys_store_zero_suffix(spark):
    from eget_spark.sources.warc import zipnum_blocks

    df = spark.createDataFrame([("k",), ("k",), ("k",)], "surt string")
    row = zipnum_blocks(df, "surt", block_size=10).collect()[0]
    # 3 identical 1-char keys: restart stores 1 char, dups store 0
    assert (row["n_keys"], row["raw_chars"], row["stored_chars"]) == (3, 3, 1)
