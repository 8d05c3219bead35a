"""Broder super-shingle candidate pairs vs a pure-Python replay."""

from __future__ import annotations

import hashlib


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _shingles(text: str, k: int):
    toks = text.lower().split()
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def _py_pairs(rows, num_hashes=12, group_size=2, k=3, min_shared=2,
              bucket_cap=50):
    sigs = {}
    for did, text in rows:
        sh = set(_shingles(text, k))
        sigs[did] = [
            min(_h60(f"{j}:{g}") for g in sh) for j in range(num_hashes)
        ]
    buckets: dict[tuple[int, int], list] = {}
    for did, mh in sigs.items():
        for g in range(num_hashes // group_size):
            parts = ":".join(
                ["ss", str(g)]
                + [str(mh[g * group_size + r]) for r in range(group_size)]
            )
            buckets.setdefault((g, _h60(parts)), []).append(did)
    shared: dict[tuple, int] = {}
    for members in buckets.values():
        if not (2 <= len(members) <= bucket_cap):
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                shared[(ms[i], ms[j])] = shared.get((ms[i], ms[j]), 0) + 1
    return sorted(
        (a, b, c) for (a, b), c in shared.items() if c >= min_shared
    )


BASE = "the quick brown fox jumps over the lazy dog near the old river bank"
ROWS = [
    (1, BASE),
    (2, BASE),                          # exact clone: shares all groups
    (3, BASE + " tonight"),             # near clone: shares most groups
    (4, "completely different words about spark dataflow engines and "
        "partitioned shuffles for web scale corpora"),
    (5, "another unrelated document mentioning politeness budgets and "
        "robots directives for a crawl frontier"),
]


def _run(spark, rows, **kw):
    from eget_spark.operators.dedup import supershingle_pairs

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = supershingle_pairs(df, "doc_id", "text", **kw).collect()
    return [(r["id_a"], r["id_b"], r["shared"]) for r in out]


def test_matches_python_replay(spark):
    assert _run(spark, ROWS) == _py_pairs(ROWS)


def test_clone_shares_all_groups(spark):
    got = {(a, b): c for a, b, c in _run(spark, ROWS)}
    assert got[(1, 2)] == 6  # identical sketch -> all 6 supershingles


def test_unrelated_docs_absent(spark):
    pairs = {(a, b) for a, b, _ in _run(spark, ROWS)}
    assert not any(4 in p or 5 in p for p in pairs)


def test_min_shared_gate(spark):
    # with the threshold raised to impossible, nothing survives
    assert _run(spark, ROWS, min_shared=7) == []


def test_bucket_cap_drops_hot_buckets(spark):
    # 5 clones of one text: every bucket has 5 members; cap 4 kills all
    rows = [(i, BASE) for i in range(5)]
    assert _run(spark, rows, bucket_cap=4) == []
    assert _run(spark, rows, bucket_cap=5) == _py_pairs(rows, bucket_cap=5)
