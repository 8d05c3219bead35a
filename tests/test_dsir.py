"""DSIR importance weights vs a pure-Python mirror."""

import hashlib
import math
import re

from eget_spark.operators.dsir import dsir_weights

B = 64


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _feats(s):
    t = _toks(s)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(f):
    return int(hashlib.md5(f"ds:{f}".encode()).hexdigest()[:15], 16) % B


def _py_dsir(raw, target):
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for _, t in raw:
        for f in _feats(t):
            cr[_bucket(f)] = cr.get(_bucket(f), 0) + 1
    for _, t in target:
        for f in _feats(t):
            ct[_bucket(f)] = ct.get(_bucket(f), 0) + 1
    R, T = sum(cr.values()), sum(ct.values())
    lr = {
        b: math.log((ct.get(b, 0) + 1) / (T + B))
        - math.log((cr.get(b, 0) + 1) / (R + B))
        for b in range(B)
    }
    out = {}
    for i, t in raw:
        fs = _feats(t)
        out[i] = (
            len(fs),
            round(sum(lr[_bucket(f)] for f in fs), 6) if fs else None,
        )
    return out


RAW = [
    (0, "stock market prices fell sharply on tuesday trading session"),
    (1, "python spark dataframe join aggregate shuffle partition broadcast"),
    (2, "the cat sat on the mat and the dog barked loudly"),
    (3, "spark sql window functions and catalyst optimizer internals"),
    (4, ""),
]
TARGET = [
    (100, "spark dataframe api with catalyst optimizer and window functions"),
    (101, "distributed shuffle partition tuning for spark sql joins"),
]


def test_dsir_matches_python_oracle(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r["id"]: (r["n_feats"], r["dsir_logw"])
        for r in dsir_weights(raw, target, n_buckets=B).collect()
    }
    assert got == _py_dsir(RAW, TARGET)


def test_dsir_target_like_docs_rank_higher(spark):
    """Docs sharing the target domain's vocabulary (spark/sql) must
    out-weigh off-domain docs — the selection property the method
    exists for."""
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r["id"]: r["dsir_logw"]
        for r in dsir_weights(raw, target, n_buckets=B).collect()
    }
    assert got[1] > got[0] and got[3] > got[2]
    assert got[4] is None  # empty doc: nothing to resample on
