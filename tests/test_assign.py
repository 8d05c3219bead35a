"""Rendezvous fetcher assignment vs a pure-Python md5 oracle."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from eget_spark.operators.assign import (
    assignment_churn,
    rendezvous_assign,
    rendezvous_owner,
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_owner(host: str, workers: list[str]) -> str:
    return max(sorted(set(workers)), key=lambda w: (_md5_60(f"{host}|{w}"), w))


def _hosts_df(spark, hosts):
    return spark.createDataFrame([(h,) for h in hosts], "host string")


def test_owner_matches_python_oracle(spark):
    hosts = [f"h{i}.example.com" for i in range(60)]
    workers = ["f0", "f1", "f2", "f3", "f4"]
    got = {
        r["host"]: r["worker"]
        for r in rendezvous_assign(_hosts_df(spark, hosts), "host", workers).collect()
    }
    assert got == {h: _py_owner(h, workers) for h in hosts}


def test_owner_spreads_load(spark):
    # 600 hosts over 5 workers: every worker owns something, and no worker
    # owns more than half the fleet (sanity on hash spread, not a tight bound)
    hosts = [f"site{i}.test" for i in range(600)]
    workers = [f"f{i}" for i in range(5)]
    counts = (
        rendezvous_assign(_hosts_df(spark, hosts), "host", workers)
        .groupBy("worker")
        .count()
        .collect()
    )
    assert len(counts) == 5
    assert max(r["count"] for r in counts) < 300


def test_single_worker_owns_everything(spark):
    hosts = ["a.com", "b.com"]
    got = rendezvous_assign(_hosts_df(spark, hosts), "host", ["only"]).collect()
    assert {r["worker"] for r in got} == {"only"}


def test_grow_churn_minimal(spark):
    # rendezvous property: adding f5 moves ONLY hosts whose new owner is f5
    hosts = [f"h{i}.example.com" for i in range(200)]
    a = [f"f{i}" for i in range(5)]
    b = a + ["f5"]
    rows = assignment_churn(_hosts_df(spark, hosts), "host", a, b).collect()
    moved = [r for r in rows if r["moved"]]
    assert all(r["worker_b"] == "f5" for r in moved)
    n_moved = sum(r["n_hosts"] for r in moved)
    n_total = sum(r["n_hosts"] for r in rows)
    assert n_total == 200
    # expected n/(k+1) ~ 33; allow a wide deterministic band
    assert 10 <= n_moved <= 70
    # python oracle agreement on the full matrix
    want: dict[tuple[str, str], int] = {}
    for h in hosts:
        key = (_py_owner(h, a), _py_owner(h, b))
        want[key] = want.get(key, 0) + 1
    got = {(r["worker_a"], r["worker_b"]): r["n_hosts"] for r in rows}
    assert got == want


def test_shrink_churn_redistributes_only_lost_worker(spark):
    # removing a worker moves exactly the hosts it owned, nothing else
    hosts = [f"h{i}.example.com" for i in range(200)]
    a = [f"f{i}" for i in range(5)]
    b = [w for w in a if w != "f2"]
    rows = assignment_churn(_hosts_df(spark, hosts), "host", a, b).collect()
    for r in rows:
        if r["moved"]:
            assert r["worker_a"] == "f2"
        else:
            assert r["worker_a"] != "f2" or r["n_hosts"] == 0


def test_owner_is_projection_no_shuffle(spark):
    # the assignment itself must not introduce an Exchange
    hosts = _hosts_df(spark, ["x.com", "y.com"])
    plan = (
        hosts.withColumn("w", rendezvous_owner(F.col("host"), ["a", "b"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_fleet_load_matches_python(spark):
    from eget_spark.operators.assign import fleet_load

    hosts = [(f"h{i}.com", (i % 5) + 1, (i % 3) * 100) for i in range(30)]
    df = spark.createDataFrame(hosts, "host string, n_pages long, delay_ms long")
    workers = ["f0", "f1", "f2"]
    got = {
        r["worker"]: (
            r["n_hosts"], r["n_fetches"], r["total_fetch_ms"],
            r["max_span_ms"], r["serial_ms"],
        )
        for r in fleet_load(df, "host", workers, fetch_ms=50).collect()
    }
    want: dict[str, list[int]] = {}
    for h, n, d in hosts:
        w = _py_owner(h, workers)
        span = n * 50 + (n - 1) * d
        a = want.setdefault(w, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += n
        a[2] += n * 50
        a[3] = max(a[3], span)
        a[4] += span
    assert got == {k: tuple(v) for k, v in want.items()}


def _py_snake(weights: dict, k: int):
    order = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))
    out = {}
    for r, (i, w) in enumerate(order):
        pos = r % k
        out[i] = pos if (r // k) % 2 == 0 else k - 1 - pos
    return out


def test_snake_pack_matches_python_oracle(spark):
    from eget_spark.operators.assign import snake_pack

    weights = {f"c{i}": ((i * 37) % 19) + 1 for i in range(45)}
    df = spark.createDataFrame(
        list(weights.items()), "community string, n long"
    )
    got = {
        r.id: r.worker
        for r in snake_pack(df, "n", k=6, id_col="community").collect()
    }
    assert got == _py_snake(weights, 6)


def test_snake_pack_balances_identical_weights_exactly(spark):
    from eget_spark.operators.assign import snake_pack

    # 24 equal items on 8 workers: every worker gets exactly 3, load 3w
    df = spark.createDataFrame(
        [(f"c{i:02d}", 5) for i in range(24)], "community string, n long"
    )
    rows = snake_pack(df, "n", k=8, id_col="community").collect()
    loads = {}
    for r in rows:
        loads[r.worker] = loads.get(r.worker, 0) + r.weight
    assert loads == {w: 15 for w in range(8)}


def test_snake_pack_bounded_imbalance_on_skew(spark):
    from eget_spark.operators.assign import snake_pack

    # power-law-ish weights: snake keeps the gap within the max weight
    ws = [(f"c{i:03d}", max(1, 1000 // (i + 1))) for i in range(64)]
    df = spark.createDataFrame(ws, "community string, n long")
    rows = snake_pack(df, "n", k=4, id_col="community").collect()
    loads = {}
    for r in rows:
        loads[r.worker] = loads.get(r.worker, 0) + r.weight
    assert set(loads) == {0, 1, 2, 3}
    assert max(loads.values()) - min(loads.values()) <= 1000
    # rank 1 is the heaviest item and sits on worker 0
    top = [r for r in rows if r.rank == 1][0]
    assert top.weight == 1000 and top.worker == 0


def _py_ring_owner(host: str, pts) -> str:
    from eget_spark.operators.assign import _md5_60bit_py

    h = _md5_60bit_py(host)
    for pos, w in pts:
        if h <= pos:
            return w
    return pts[0][1]


def test_ring_matches_python_mirror(spark):
    from eget_spark.operators.assign import ring_assign, ring_points

    workers = [f"f{i}" for i in range(6)]
    pts = ring_points(workers, vnodes=8)
    hosts = [f"h{i}.example.org" for i in range(60)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["worker"]
        for r in ring_assign(df, "host", workers, vnodes=8).collect()
    }
    assert got == {h: _py_ring_owner(h, pts) for h in hosts}
    # every worker owns at least one of the 48 arcs' hosts at this size
    assert set(got.values()) <= set(workers)


def test_ring_points_sorted_distinct():
    from eget_spark.operators.assign import ring_points

    pts = ring_points([f"f{i}" for i in range(8)], vnodes=16)
    assert len(pts) == 128
    positions = [p for p, _ in pts]
    assert positions == sorted(positions)
    assert len(set(positions)) == 128  # 2^-60 collisions: none here


def test_ring_removal_moves_only_removed_workers_hosts(spark):
    """The consistent-hashing contract: removing one worker reassigns
    ONLY the hosts that worker owned (its arcs are absorbed by ring
    successors); every other host keeps its owner — politeness clocks
    and robots caches survive the resize."""
    from eget_spark.operators.assign import ring_assign

    workers = [f"f{i}" for i in range(6)]
    without = [w for w in workers if w != "f3"]
    df = spark.createDataFrame(
        [(f"h{i}.example.org",) for i in range(120)], "host string"
    )
    both = ring_assign(
        ring_assign(df, "host", workers, vnodes=8, out_col="before"),
        "host",
        without,
        vnodes=8,
        out_col="after",
    ).collect()
    moved = [r for r in both if r["before"] != r["after"]]
    assert all(r["before"] == "f3" for r in moved)
    assert all(r["after"] != "f3" for r in both)
    assert moved  # f3 owned something at this size


def test_ring_vnodes_smooth_load(spark):
    """More virtual nodes -> smoother load: on this fixed corpus the
    max/min host-count gap at vnodes=32 is no worse than at vnodes=1
    (deterministic pin on the fixed hash ring, not a statistical claim)."""
    from collections import Counter

    from eget_spark.operators.assign import ring_points

    workers = [f"f{i}" for i in range(5)]
    hosts = [f"h{i}.example.org" for i in range(400)]

    def spread(v):
        pts = ring_points(workers, vnodes=v)
        c = Counter(_py_ring_owner(h, pts) for h in hosts)
        loads = [c.get(w, 0) for w in workers]
        return max(loads) - min(loads)

    assert spread(32) <= spread(1)
