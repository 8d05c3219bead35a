"""Count-min sketch vs a pure-Python construction."""

from __future__ import annotations

import hashlib

from eget_spark.operators.cms import build_cms, cms_counts


def _h(key: str, j: int, width: int) -> int:
    return int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:15], 16) % width


def _py_cms(keys, depth, width):
    grid = {}
    for k in keys:
        for j in range(depth):
            cell = (j, _h(k, j, width))
            grid[cell] = grid.get(cell, 0) + 1
    est = {}
    for k in set(keys):
        est[k] = min(grid[(j, _h(k, j, width))] for j in range(depth))
    return grid, est


def _keys():
    # skewed: key i appears i+1 times
    out = []
    for i in range(20):
        out += [f"host{i}.example.org"] * (i + 1)
    return out


def test_sketch_cells_match_python(spark):
    keys = _keys()
    df = spark.createDataFrame([(k,) for k in keys], "host string")
    got = {
        (r["j"], r["bucket"]): r["c"]
        for r in build_cms(df, "host", depth=4, width=16).collect()
    }
    grid, _ = _py_cms(keys, 4, 16)
    assert got == grid


def test_estimates_dominate_exact_and_match_python(spark):
    keys = _keys()
    df = spark.createDataFrame([(k,) for k in keys], "host string")
    rows = cms_counts(df, "host", depth=4, width=16).collect()
    _, est = _py_cms(keys, 4, 16)
    assert len(rows) == 20
    for r in rows:
        assert r["cms_n"] == est[r["host"]]
        assert r["cms_n"] >= r["exact_n"]  # CMS never underestimates


def test_wide_sketch_is_exact(spark):
    # width >> keys: no collisions, estimate == exact
    keys = _keys()
    df = spark.createDataFrame([(k,) for k in keys], "host string")
    rows = cms_counts(df, "host", depth=4, width=4096).collect()
    assert all(r["cms_n"] == r["exact_n"] for r in rows)
