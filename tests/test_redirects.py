"""Redirect-chain resolution (pointer doubling) vs a pure-Python walk."""

from __future__ import annotations

from eget_spark.operators.redirects import resolve_redirects


def _dfs(spark, ids, pairs):
    u = spark.createDataFrame([(i,) for i in ids], "id long")
    r = spark.createDataFrame(pairs, "src long, dst long")
    return u, r


def _py_resolve(ids, pairs, max_hops=8):
    nxt = dict(pairs)
    out = {}
    for i in ids:
        cur, hops = i, 0
        while cur in nxt and hops < max_hops:
            cur, hops = nxt[cur], hops + 1
        out[i] = (cur, hops, cur not in nxt)
    return out


def _collect(df):
    return {
        r["id"]: (r["final_id"], r["hops"], r["resolved"]) for r in df.collect()
    }


def test_chains_cycles_and_terminals(spark):
    ids = list(range(12))
    # 0->1->2->3 (terminal), 4->5->4 cycle, 6 terminal, 7..11 long chain ->7 cycle
    pairs = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 4),
             (7, 8), (8, 9), (9, 10), (10, 11), (11, 7)]
    u, r = _dfs(spark, ids, pairs)
    got = _collect(resolve_redirects(u, r, max_hops=8))
    assert got == _py_resolve(ids, pairs)
    assert got[0] == (3, 3, True)
    assert got[4][2] is False and got[4][1] == 8  # cycle: capped, unresolved
    assert got[6] == (6, 0, True)


def test_exactly_at_cap_is_resolved(spark):
    # chain of exactly 8 hops ends terminal: resolved with hops == 8
    ids = list(range(9))
    pairs = [(i, i + 1) for i in range(8)]
    u, r = _dfs(spark, ids, pairs)
    got = _collect(resolve_redirects(u, r, max_hops=8))
    assert got[0] == (8, 8, True)
    # 9-hop chain from a prepended node would be unresolved at 8
    ids2 = list(range(10))
    pairs2 = [(i, i + 1) for i in range(9)]
    u2, r2 = _dfs(spark, ids2, pairs2)
    got2 = _collect(resolve_redirects(u2, r2, max_hops=8))
    assert got2[0] == (8, 8, False)
    assert got2 == _py_resolve(ids2, pairs2)


def test_max_hops_power_of_two_enforced(spark):
    import pytest

    u, r = _dfs(spark, [0], [])
    with pytest.raises(ValueError):
        resolve_redirects(u, r, max_hops=6)


def test_chains_through_nodes_outside_universe_resolve(spark):
    """A redirect target absent from the universe must still resolve —
    the doubling table covers the full node set, not just universe ids."""
    from eget_spark.operators.redirects import resolve_redirects

    universe = spark.createDataFrame([("A",), ("D",)], "id string")
    redirects = spark.createDataFrame(
        [("A", "B"), ("B", "C")], "src string, dst string"
    )  # B, C never in the universe
    got = {r["id"]: (r["final_id"], r["hops"], r["resolved"]) for r in
           resolve_redirects(universe, redirects, max_hops=8).collect()}
    assert got["A"] == ("C", 2, True)
    assert got["D"] == ("D", 0, True)
    assert set(got) == {"A", "D"}  # outside nodes don't leak into output
