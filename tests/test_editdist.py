"""Blocked Levenshtein near-dup pairs vs a pure-Python replay."""

from __future__ import annotations


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            ))
        prev = cur
    return prev[-1]


def _py_pairs(rows, max_dist, prefix_len, len_band, cap):
    blocks: dict[str, list[tuple[int, str]]] = {}
    for did, t in rows:
        if t is None:
            continue
        blk = f"{t[:prefix_len]}|{len(t) // len_band}"
        blocks.setdefault(blk, []).append((did, t))
    out = []
    for blk, members in blocks.items():
        members.sort(key=lambda m: (m[1], m[0]))
        members = members[:cap]
        for i in range(len(members)):
            for j in range(len(members)):
                ia, ta = members[i]
                ib, tb = members[j]
                if ia < ib:
                    d = _lev(ta, tb)
                    if d <= max_dist:
                        out.append((ia, ib, d))
    return sorted(out)


ROWS = [
    (1, "crawler budget report"),
    (2, "crawler budget reprot"),      # 2-edit typo of 1
    (3, "crawler budget summary"),     # same block, far
    (4, "crawlers budget report"),     # length crosses nothing; 1 insert
    (5, "spider budget report"),       # different prefix -> other block
    (6, "crawl"),                      # different length band
    (7, None),                         # null dropped
    (8, "crawler budget report"),      # exact dup of 1
]


def _run(spark, rows, **kw):
    from eget_spark.operators.editdist import editdist_near_dups

    df = spark.createDataFrame(rows, "doc_id long, title string")
    out = editdist_near_dups(df, "doc_id", "title", **kw).collect()
    return sorted((r["id_a"], r["id_b"], r["dist"]) for r in out)


def test_matches_python_replay(spark):
    got = _run(spark, ROWS, max_dist=3, prefix_len=4, len_band=8,
               cap=256)
    assert got == _py_pairs(ROWS, 3, 4, 8, 256)
    # the typo pair, the insert pair, and the exact dup are all found
    found = {(a, b) for a, b, _ in got}
    assert {(1, 2), (1, 8), (2, 8)} <= found
    assert (1, 4) in found  # one-insert neighbor, same 4-char prefix
    # exact duplicate has distance zero
    assert (1, 8, 0) in got


def test_blocking_recall_contract(spark):
    got = _run(spark, ROWS, max_dist=3, prefix_len=4, len_band=8,
               cap=256)
    pairs = {(a, b) for a, b, _ in got}
    # different prefix (5) and different length band (6) are MISSED by
    # design even though 5 is within 3 edits of nothing here anyway —
    # assert the block boundary, not the distance
    assert not any(5 in p or 6 in p for p in pairs)


def test_cap_bounds_block(spark):
    # a degenerate block: 10 identical titles, cap 4 -> C(4,2) pairs
    rows = [(i, "home page") for i in range(10)]
    got = _run(spark, rows, max_dist=3, prefix_len=4, len_band=8, cap=4)
    assert got == _py_pairs(rows, 3, 4, 8, 4)
    assert len(got) == 6


def test_corpus_pairs_match_duckdb_shape(spark):
    import duckdb

    q = """
    WITH t AS (SELECT doc_id, substr(text,1,16) AS ttl
               FROM '/root/testdata/sf0.001/documents.parquet'),
    b AS (SELECT doc_id, ttl,
                 concat(substr(ttl,1,4), '|',
                        CAST(length(ttl) // 8 AS VARCHAR)) AS blk
          FROM t)
    SELECT a.doc_id, c.doc_id, levenshtein(a.ttl, c.ttl)
    FROM b a JOIN b c
      ON a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE levenshtein(a.ttl, c.ttl) <= 4
    ORDER BY 1, 2
    """
    want = [tuple(r) for r in duckdb.sql(q).fetchall()]

    from pyspark.sql import functions as F

    from eget_spark.operators.editdist import editdist_near_dups

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id", F.expr("substring(text, 1, 16)").alias("title")
    )
    got = [
        (r["id_a"], r["id_b"], r["dist"])
        for r in editdist_near_dups(
            docs, "doc_id", "title", max_dist=4, prefix_len=4,
            len_band=8, cap=256,
        ).collect()
    ]
    assert got == want
