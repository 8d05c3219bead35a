"""Batched property tests for the round-5 text/sampling functions: one
Spark job over hundreds of generated strings/ids, checked against
independent pure-Python references (same coverage intent as per-example
hypothesis rounds at a fraction of the job count)."""

from __future__ import annotations

import hashlib
import random
import re
import string

import pyspark.sql.functions as F


def _texts(n=250, seed=11):
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + "  .,;!?…()-'\n\t"
    out = []
    for _ in range(n):
        k = rng.randint(0, 60)
        out.append("".join(rng.choice(alphabet) for _ in range(k)))
    out += ["", " ", "...", "a", "AEIOUY", "zzz", "one. two! three?"]
    return out


def _py_flesch_parts(text: str):
    ws = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    sent = max(1, len(re.findall(r"[.!?]+", text)))
    syl = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in ws)
    return sent, len(ws), syl


def test_flesch_parts_match_python_reference_in_one_job(spark):
    from eget_spark.functions.text import flesch_reading_ease

    rows = [(i, s) for i, s in enumerate(_texts())]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in flesch_reading_ease(df, "id", "text").collect()}
    for i, s in rows:
        sent, words, syl = _py_flesch_parts(s)
        r = got[i]
        assert (r["n_sentences"], r["n_words"], r["n_syllables"]) == (
            sent, words, syl,
        ), repr(s)
        if words == 0:
            assert r["flesch"] is None, repr(s)
        else:
            want = round(
                206.835 - 1.015 * (words / sent) - 84.6 * (syl / words), 6
            )
            assert abs(r["flesch"] - want) < 1e-9, repr(s)


def test_bpe_pairs_match_python_reference_in_one_job(spark):
    from collections import Counter

    from eget_spark.functions.text import bpe_pair_counts

    rows = [(i, s) for i, s in enumerate(_texts(seed=23))]
    df = spark.createDataFrame(rows, "id long, text string")
    got = [
        (r["pair"], r["n"])
        for r in bpe_pair_counts(df, "id", "text", 10_000).collect()
    ]
    c = Counter()
    for _, s in rows:
        for w in re.split(r"[^a-z0-9]+", s.lower()):
            if len(w) >= 2:
                for j in range(len(w) - 1):
                    c[w[j : j + 2]] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want


def test_group_split_total_and_stability_under_union(spark):
    """Adding rows of NEW groups never changes existing assignments
    (the property random splits lack) — checked in one job."""
    from eget_spark.operators.sampling import split_by_group

    base = [(i, f"g{i % 61}") for i in range(400)]
    more = base + [(1000 + i, f"extra{i}") for i in range(50)]
    a = {
        r["id"]: r["split"]
        for r in split_by_group(
            spark.createDataFrame(base, "id long, g string"), "g", seed="z"
        ).collect()
    }
    b = {
        r["id"]: r["split"]
        for r in split_by_group(
            spark.createDataFrame(more, "id long, g string"), "g", seed="z"
        ).collect()
    }
    assert all(b[i] == s for i, s in a.items())
    # and the hash rule itself
    for i, g in base:
        bucket = int(hashlib.md5(f"z{g}".encode()).hexdigest()[:15], 16) % 10
        want = "train" if bucket < 8 else "val" if bucket < 9 else "test"
        assert a[i] == want
