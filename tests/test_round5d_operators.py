"""Property tests for the q156-q159 batch (caption pairing, span
renumbering, media-ref audit, makespan bound): seeded random span
sequences against independent pure-Python references, batched into a
handful of Spark jobs (the test_normalize_property.py discipline)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

SPAN_SCHEMA = (
    "id long, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)

TEXT = ("heading", "paragraph")
MEDIA = ("image", "video")


def _random_docs(seed, n_docs):
    rng = random.Random(seed)
    docs = []
    for d in range(n_docs):
        spans = []
        for pos in range(rng.randint(0, 10)):
            if rng.random() < 0.45:
                kind = rng.choice(MEDIA)
                spans.append((kind, "", f"m{d}_{pos}", pos))
            else:
                kind = rng.choice(TEXT)
                spans.append((kind, f"t{d}_{pos}", "", pos))
        docs.append((d, spans))
    return docs


def _expected_captions(spans):
    out = []
    for i, (kind, text, ref, off) in enumerate(spans):
        if kind not in MEDIA:
            continue
        before = next(
            (s[1] for s in reversed(spans[:i]) if s[0] in TEXT), None
        )
        after = next((s[1] for s in spans[i + 1:] if s[0] in TEXT), None)
        out.append((ref, kind, off, before, after, before or after))
    return out


def test_caption_pairs_random(spark):
    from eget_spark.operators.captions import caption_pairs

    docs = _random_docs(56, 80)
    df = spark.createDataFrame(docs, SPAN_SCHEMA)
    got = {}
    for r in caption_pairs(df, "id", "spans").collect():
        got.setdefault(r["id"], []).append(
            (
                r["media_ref"],
                r["media_kind"],
                r["offset"],
                r["caption_before"],
                r["caption_after"],
                r["caption"],
            )
        )
    for d, spans in docs:
        want = _expected_captions(spans)
        have = sorted(got.get(d, []), key=lambda t: t[2])
        assert have == want, (d, spans)


def test_caption_pairs_media_only_doc(spark):
    from eget_spark.operators.captions import caption_pairs

    df = spark.createDataFrame(
        [(0, [("image", "", "m0", 0), ("video", "", "v0", 1)])], SPAN_SCHEMA
    )
    rows = caption_pairs(df, "id", "spans").orderBy("offset").collect()
    assert [(r["caption_before"], r["caption_after"], r["caption"])
            for r in rows] == [(None, None, None), (None, None, None)]


def test_renumber_spans_random(spark):
    from eget_spark.functions.spans import renumber_spans

    docs = _random_docs(57, 60)
    df = spark.createDataFrame(docs, SPAN_SCHEMA)
    out = df.select(
        "id", renumber_spans(F.col("spans"), MEDIA).alias("kept")
    ).collect()
    for r in out:
        d = dict(docs)[r["id"]]
        want = [s for s in d if s[0] not in MEDIA]
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["kept"]]
        assert [g[:3] for g in got] == [w[:3] for w in want]
        assert [g[3] for g in got] == list(range(len(want)))


def test_media_audit_counts(spark):
    from eget_spark.operators.media_refs import media_audit

    refs = spark.createDataFrame(
        [(0, "a"), (0, "a"), (0, "b"), (1, "c"), (1, "d")],
        "id long, media_ref string",
    )
    blobs = spark.createDataFrame(
        [(0, "a"), (1, "c"), (1, "x"), (0, "y")],
        "bucket long, media_ref string",
    )
    rows = {
        r["bucket"]: (r["n_refs"], r["n_dangling"], r["n_orphans"])
        for r in media_audit(
            refs, blobs, F.col("id").cast("long")
        ).collect()
    }
    # bucket 0: refs {a,b}; b dangling; blob y orphan. bucket 1: refs
    # {c,d}; d dangling; blob x orphan.
    assert rows == {0: (2, 1, 1), 1: (2, 1, 1)}


def test_makespan_bound_pinned(spark):
    from eget_spark.operators.politeness import makespan_bound

    hosts = spark.createDataFrame(
        [(0, 10, 1000), (1, 100, 0), (2, 1, 500)],
        "host_id long, n_pages long, delay_ms long",
    )
    r = makespan_bound(
        hosts, fetch_ms=50, workers=4
    ).collect()[0]
    # spans: 10*50+9*1000=9500, 100*50=5000, 50; total fetch 111*50=5550
    assert r["n_hosts"] == 3
    assert r["total_fetch_ms"] == 5550
    assert r["max_host_span_ms"] == 9500
    assert r["capacity_ms"] == (5550 + 3) // 4
    assert r["makespan_lb_ms"] == 9500
    assert bool(r["skew_bound"]) is True
