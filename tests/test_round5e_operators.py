"""Property tests for the q160-q163 batch (cache TTL, retry backoff,
table-cell mining, mixture reweighting) against pure-Python references."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F


def _py_ttl(cc, exp, date):
    cc = (cc or "").lower()
    if "no-store" in cc or "no-cache" in cc:
        return 0
    m = re.search(r"(?:^|[,\s])max-age=([0-9]+)", cc)
    if m:
        return int(m.group(1))
    if exp is not None and date is not None:
        return max(0, exp - date)
    return None


def test_cache_ttl_cases(spark):
    from eget_spark.functions.headers import cache_ttl_seconds

    rows = [
        (0, "no-store", 100, 50),
        (1, "public, max-age=300", 100, 50),
        (2, "max-age=0", 100, 50),
        (3, "s-maxage=10, max-age=7200", None, None),
        (4, None, 100, 50),
        (5, None, 40, 50),        # stale Expires clamps at 0
        (6, None, None, 50),      # underivable -> NULL
        (7, "private, no-cache, max-age=60", 100, 50),
        (8, "nomax-age=5", None, None),  # boundary: not a directive start
        (9, "MAX-AGE=25", None, None),   # case-insensitive
    ]
    df = spark.createDataFrame(
        rows, "id long, cc string, exp long, dt long"
    )
    got = {
        r["id"]: r["ttl"]
        for r in df.select(
            "id",
            cache_ttl_seconds(
                F.col("cc"), F.col("exp"), F.col("dt")
            ).alias("ttl"),
        ).collect()
    }
    for i, cc, exp, dt in rows:
        assert got[i] == _py_ttl(cc, exp, dt), (i, cc)


def test_backoff_ladder(spark):
    from eget_spark.functions.headers import backoff_ms, retry_after_seconds

    rows = [
        (0, 0, "17"),
        (1, 3, ""),
        (2, 10, None),                # cap: 500<<10 > 60000
        (3, 5, " 42 "),               # trimmed delta-seconds
        (4, 2, "Fri, 01 Jan 2027 00:00:00 GMT"),  # date form -> NULL here
    ]
    df = spark.createDataFrame(rows, "id long, attempt int, hdr string")
    ra = retry_after_seconds(F.col("hdr"))
    got = {
        r["id"]: (r["ra"], r["b"])
        for r in df.select(
            "id", ra.alias("ra"),
            backoff_ms(F.col("attempt"), ra).alias("b"),
        ).collect()
    }
    assert got[0] == (17, 17_000)
    assert got[1] == (None, 4_000)
    assert got[2] == (None, 60_000)
    assert got[3] == (42, 42_000)
    assert got[4] == (None, 2_000)


def test_headers_hostile_values(spark):
    # review findings: >int64 digit strings must degrade (try_cast), not
    # throw under ANSI mode; the shift ladder must stay capped past 31
    from eget_spark.functions.headers import (
        backoff_ms,
        cache_ttl_seconds,
        retry_after_seconds,
    )

    big = "9" * 20
    df = spark.createDataFrame(
        [
            (0, f"max-age={big}", 150, 100),
            (1, big, None, None),
        ],
        "id long, s string, exp long, dt long",
    )
    r0 = df.where("id = 0").select(
        cache_ttl_seconds(F.col("s"), F.col("exp"), F.col("dt")).alias("t")
    ).collect()[0]["t"]
    assert r0 == 50  # overflowing max-age falls through to Expires-Date
    r1 = df.where("id = 1").select(
        retry_after_seconds(F.col("s")).alias("r")
    ).collect()[0]["r"]
    assert r1 is None

    at = spark.createDataFrame(
        [(i, a) for i, a in enumerate([7, 31, 32, 63])],
        "id long, attempt int",
    )
    got = {
        r["id"]: r["b"]
        for r in at.select(
            "id",
            backoff_ms(F.col("attempt"), F.lit(None).cast("long")).alias(
                "b"
            ),
        ).collect()
    }
    assert got == {0: 60_000, 1: 60_000, 2: 60_000, 3: 60_000}


def test_table_cells_random(spark):
    from eget_spark.operators.table_mining import extract_table_cells

    rng = random.Random(58)
    docs, want = [], []
    for d in range(40):
        spans, t_idx = [], 0
        for pos in range(rng.randint(0, 4)):
            if rng.random() < 0.5:
                spans.append(("paragraph", f"t{d}_{pos}", "", pos))
                continue
            rows = [
                [f"x{d}_{t_idx}_{r}_{c}" for c in range(rng.randint(1, 3))]
                for r in range(rng.randint(1, 3))
            ]
            text = "\n".join("\t".join(r) for r in rows)
            spans.append(("table", text, "", pos))
            for r, row in enumerate(rows):
                for c, cell in enumerate(row):
                    want.append((d, t_idx, r, c, cell))
            t_idx += 1
        docs.append((d, spans))
    df = spark.createDataFrame(
        docs,
        "id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = sorted(
        (r["id"], r["table_idx"], r["row_idx"], r["col_idx"], r["cell"])
        for r in extract_table_cells(df, "id", "spans").collect()
    )
    assert got == sorted(want)


def test_table_cells_empty_cells_survive(spark):
    from eget_spark.operators.table_mining import extract_table_cells

    df = spark.createDataFrame(
        [(0, [("table", "a\t\tb\n\tc", "", 0)])],
        "id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = sorted(
        (r["row_idx"], r["col_idx"], r["cell"])
        for r in extract_table_cells(df, "id", "spans").collect()
    )
    assert got == [(0, 0, "a"), (0, 1, ""), (0, 2, "b"), (1, 0, ""),
                   (1, 1, "c")]


def test_mixture_weights_arithmetic(spark):
    from eget_spark.operators.sampling import mixture_weights

    rows = [(i, ["en", "en", "en", "de", "xx"][i % 5], 100 + i)
            for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string, tok long")
    target = {"en": 300_000, "de": 600_000, "missing": 100_000}
    got = {
        r["grp"]: (
            r["n_docs"], r["n_tokens"], r["corpus_ppm"], r["target_ppm"],
            r["weight_ppm"], r["sampled_tokens_est"],
        )
        for r in mixture_weights(df, "grp", "tok", target).collect()
    }
    toks = {}
    for _, g, t in rows:
        toks[g] = toks.get(g, 0) + t
    total = sum(toks.values())
    for g, (nd, nt, cp, tp, wp, st) in got.items():
        assert nt == toks[g]
        assert cp == nt * 1_000_000 // total
        assert tp == target.get(g, 0)
        assert wp == min(1_000_000, tp * 1_000_000 // max(cp, 1))
        assert st == nt * wp // 1_000_000
    assert got["xx"][4] == 0  # unplanned stratum drops entirely
