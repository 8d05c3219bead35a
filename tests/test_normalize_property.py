"""Batched property tests for the dedup normalizer: one Spark job over
hundreds of generated strings, checked against an independent pure-
Python reference (cheaper than per-example hypothesis rounds, same
coverage intent)."""

import random
import re
import string

import pyspark.sql.functions as F

from eget_spark.functions.text import ACCENT_DST, ACCENT_SRC, dedup_normalize, fold_accents

_TABLE = {ord(s): d for s, d in zip(ACCENT_SRC, ACCENT_DST)}


def _py_fold(s: str) -> str:
    t = s.lower()
    for a, b in (("æ", "ae"), ("œ", "oe"), ("ß", "ss")):
        t = t.replace(a, b)
    return t.translate(_TABLE)


def _py_norm(s: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", _py_fold(s)).strip()


def _corpus(n=300, seed=7):
    rng = random.Random(seed)
    alphabet = (
        string.ascii_letters + string.digits + "  .,;!?-_/()"
        + ACCENT_SRC + ACCENT_SRC.upper() + "æœßÆŒ"
    )
    return ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
            for _ in range(n)]


def test_fold_matches_python_reference(spark):
    rows = [(i, s) for i, s in enumerate(_corpus())]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {r["i"]: r["o"] for r in df.select(
        "i", fold_accents(F.col("s")).alias("o")).collect()}
    for i, s in rows:
        assert got[i] == _py_fold(s), repr(s)


def test_normalize_matches_reference_and_is_idempotent(spark):
    rows = [(i, s) for i, s in enumerate(_corpus(seed=13))]
    df = spark.createDataFrame(rows, "i long, s string")
    out = df.select(
        "i",
        dedup_normalize(F.col("s")).alias("n1"),
        dedup_normalize(dedup_normalize(F.col("s"))).alias("n2"),
    ).collect()
    for r in out:
        s = rows[r["i"]][1]
        assert r["n1"] == _py_norm(s), repr(s)
        assert r["n2"] == r["n1"]  # idempotence
