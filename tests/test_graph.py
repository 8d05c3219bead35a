"""PageRank / degree analytics vs a pure-Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.operators.graph import (
    in_degree_histogram,
    out_degrees,
    pagerank,
    pagerank_fixed,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _py_pagerank(ids, pairs, n_iter=5, damping=0.85, nd=12):
    n = len(ids)
    deg: dict[int, int] = {}
    for s, _ in pairs:
        deg[s] = deg.get(s, 0) + 1
    pr = {i: 1.0 / n for i in ids}
    for _ in range(n_iter):
        dang = sum(p for i, p in pr.items() if i not in deg)
        contrib: dict[int, float] = {}
        for s, d in pairs:
            contrib[d] = contrib.get(d, 0.0) + pr[s] / deg[s]
        pr = {
            i: round(
                (1 - damping) / n + damping * (contrib.get(i, 0.0) + dang / n), nd
            )
            for i in ids
        }
    return pr


def test_pagerank_matches_python_oracle(spark):
    ids = list(range(12))
    pairs = [(i, (i * 7 + 13) % 12) for i in ids] + [(i, (i * 11 + 5) % 12) for i in ids]
    got = {
        r["id"]: r["pr"]
        for r in pagerank(_nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=5).collect()
    }
    want = _py_pagerank(ids, pairs)
    assert got == want


def test_pagerank_dangling_mass_conserved(spark):
    # node 3 has no out-edges: its rank must be redistributed, total mass ~1
    ids = [0, 1, 2, 3]
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3)]
    res = pagerank(_nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=10)
    total = res.agg(F.sum("pr")).first()[0]
    assert abs(total - 1.0) < 1e-9
    want = _py_pagerank(ids, pairs, n_iter=10)
    got = {r["id"]: r["pr"] for r in res.collect()}
    assert got == want


def test_pagerank_parallel_edges_weighted(spark):
    # two parallel edges 0->1 plus 0->2: node 1 gets 2/3 of node 0's rank
    ids = [0, 1, 2]
    pairs = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]
    got = {
        r["id"]: r["pr"]
        for r in pagerank(_nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=3).collect()
    }
    assert got == _py_pagerank(ids, pairs, n_iter=3)
    assert got[1] > got[2]


def _py_pagerank_fixed(ids, pairs, n_iter=5, num=17, den=20, scale=10**12):
    n = len(ids)
    deg: dict[int, int] = {}
    for s, _ in pairs:
        deg[s] = deg.get(s, 0) + 1
    base = (scale * (den - num)) // den // n
    pr = {i: scale // n for i in ids}
    for _ in range(n_iter):
        dang = sum(p for i, p in pr.items() if i not in deg)
        contrib: dict[int, int] = {}
        for s, d in pairs:
            contrib[d] = contrib.get(d, 0) + pr[s] // deg[s]
        pr = {
            i: base + (num * (contrib.get(i, 0) + dang // n)) // den for i in ids
        }
    return pr


def test_pagerank_fixed_bit_exact(spark):
    ids = list(range(15))
    pairs = (
        [(i, (i * 7 + 13) % 15) for i in ids]
        + [(i, (i * i * 3 + 5) % 15) for i in ids]
        + [(3, 4), (3, 4)]  # parallel edges
    )
    # node 14 dangling: drop its out-edges
    pairs = [(s, d) for s, d in pairs if s != 14]
    got = {
        r["id"]: r["pr_fp"]
        for r in pagerank_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=5
        ).collect()
    }
    assert got == _py_pagerank_fixed(ids, pairs, n_iter=5)


def test_degree_helpers(spark):
    ids = [0, 1, 2, 3]
    pairs = [(0, 1), (0, 1), (1, 2), (3, 2)]
    od = {r["src"]: r["out_deg"] for r in out_degrees(_edges_df(spark, pairs)).collect()}
    assert od == {0: 2, 1: 1, 3: 1}
    hist = {
        r["in_deg"]: r["n_nodes"]
        for r in in_degree_histogram(
            _edges_df(spark, pairs), _nodes_df(spark, ids)
        ).collect()
    }
    # node1 in-deg 2 (parallel), node2 in-deg 2, nodes 0,3 in-deg 0
    assert hist == {0: 2, 2: 2}


def _py_hits(ids, pairs, n_iter=4):
    h = {i: 1 for i in ids}
    a = {i: 0 for i in ids}
    for _ in range(n_iter):
        a = {i: 0 for i in ids}
        for s, d in pairs:
            a[d] += h[s]
        h = {i: 0 for i in ids}
        for s, d in pairs:
            h[s] += a[d]
    return a, h


def test_hits_matches_python_oracle(spark):
    from eget_spark.operators.graph import hits_fixed

    ids = list(range(15))
    pairs = [(i, (i * 7 + 13) % 15) for i in ids] + [
        (i, (i * i * 3 + 5) % 15) for i in ids
    ]
    got = {
        r["id"]: (r["auth_fp"], r["hub_fp"])
        for r in hits_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=4
        ).collect()
    }
    a, h = _py_hits(ids, pairs)
    assert got == {i: (a[i], h[i]) for i in ids}


def test_hits_isolated_node_is_zero(spark):
    from eget_spark.operators.graph import hits_fixed

    ids = [0, 1, 2, 9]  # 9 has no edges at all
    pairs = [(0, 1), (1, 2), (2, 0)]
    got = {
        r["id"]: (r["auth_fp"], r["hub_fp"])
        for r in hits_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=3
        ).collect()
    }
    assert got[9] == (0, 0)
    assert all(v >= 0 for pair in got.values() for v in pair)


def _py_trustrank(ids, pairs, seeds, n_iter=5, num=17, den=20, scale=10**12):
    """Pure-Python mirror of trustrank_fixed's integer arithmetic."""
    s = len(seeds)
    deg: dict[int, int] = {}
    for a, _ in pairs:
        deg[a] = deg.get(a, 0) + 1
    base = (scale * (den - num)) // den // s
    tr = {i: (scale // s if i in seeds else 0) for i in ids}
    for _ in range(n_iter):
        dang = sum(p for i, p in tr.items() if i not in deg)
        contrib: dict[int, int] = {}
        for a, b in pairs:
            contrib[b] = contrib.get(b, 0) + tr[a] // deg[a]
        tr = {
            i: (base if i in seeds else 0)
            + (num * (contrib.get(i, 0) + (dang // s if i in seeds else 0)))
            // den
            for i in ids
        }
    return tr


def test_trustrank_matches_python_oracle(spark):
    from eget_spark.operators.graph import trustrank_fixed

    ids = list(range(14))
    pairs = [(i, (i * 7 + 13) % 14) for i in ids] + [
        (i, (i * i * 3 + 5) % 14) for i in ids
    ]
    seeds = {0, 3, 9}
    got = {
        r["id"]: r["tr_fp"]
        for r in trustrank_fixed(
            _nodes_df(spark, ids),
            _edges_df(spark, pairs),
            _nodes_df(spark, sorted(seeds)),
            n_iter=5,
        ).collect()
    }
    want = _py_trustrank(ids, pairs, seeds)
    assert got == want


def test_trustrank_unreachable_is_zero(spark):
    """A node with no path from any seed must converge to exactly 0 —
    the property PageRank lacks and the whole point of seeding."""
    from eget_spark.operators.graph import trustrank_fixed

    ids = [0, 1, 2, 3]
    # 0 -> 1; island 2 -> 3 (no inbound from the seed component)
    pairs = [(0, 1), (2, 3)]
    got = {
        r["id"]: r["tr_fp"]
        for r in trustrank_fixed(
            _nodes_df(spark, ids),
            _edges_df(spark, pairs),
            _nodes_df(spark, [0]),
            n_iter=4,
        ).collect()
    }
    assert got[2] == 0 and got[3] == 0
    assert got[0] > 0 and got[1] > 0
    assert got == _py_trustrank(ids, pairs, {0}, n_iter=4)


def test_trustrank_empty_seeds(spark):
    from eget_spark.operators.graph import trustrank_fixed

    ids = [0, 1]
    out = trustrank_fixed(
        _nodes_df(spark, ids),
        _edges_df(spark, [(0, 1)]),
        _nodes_df(spark, []),
    ).collect()
    assert {r["tr_fp"] for r in out} == {0}


def test_link_reciprocity_matches_python(spark):
    from eget_spark.operators.graph import link_reciprocity

    pairs = [
        (0, 1), (1, 0),          # reciprocal pair
        (0, 2),                  # one-way
        (2, 2),                  # self-loop: dropped
        (0, 1), (0, 1),          # parallel edges collapse
        (3, 0),                  # one-way into the exchange
    ]
    got = {
        r["id"]: (r["n_out"], r["n_recip"], r["recip_permille"])
        for r in link_reciprocity(_edges_df(spark, pairs)).collect()
    }
    # 0: out {1, 2}; (0,1) reciprocated -> 1/2 = 500 permille
    # 1: out {0}; reciprocated -> 1000
    # 2: only the self-loop -> no qualifying out-edge, absent
    # 3: out {0}; not reciprocated -> 0
    assert got == {0: (2, 1, 500), 1: (1, 1, 1000), 3: (1, 0, 0)}


def _py_opic(ids, pairs, n_iter=5, scale=10**12):
    """Pure-python integer OPIC oracle (synchronous rounds, virtual page)."""
    n = len(ids)
    deg: dict[int, int] = {}
    for s, _ in pairs:
        deg[s] = deg.get(s, 0) + 1
    cash = {i: scale // n for i in ids}
    hist = {i: 0 for i in ids}
    for _ in range(n_iter):
        virt = sum(c for i, c in cash.items() if i not in deg)
        contrib: dict[int, int] = {}
        for s, d in pairs:
            contrib[d] = contrib.get(d, 0) + cash[s] // deg[s]
        hist = {i: hist[i] + cash[i] for i in ids}
        cash = {i: contrib.get(i, 0) + virt // n for i in ids}
    return {i: (cash[i], hist[i], cash[i] + hist[i]) for i in ids}


def test_opic_matches_python_oracle(spark):
    from eget_spark.operators.graph import opic_fixed

    ids = list(range(12))
    # mix: parallel edges (i=2 twice to same dst), a self-loop, danglers
    pairs = (
        [(i, (i * 7 + 13) % 12) for i in range(9)]
        + [(i, (i * 11 + 5) % 12) for i in range(9)]
        + [(2, (2 * 7 + 13) % 12), (4, 4)]
    )
    got = {
        r["id"]: (r["cash_fp"], r["hist_fp"], r["opic_fp"])
        for r in opic_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=5
        ).collect()
    }
    assert got == _py_opic(ids, pairs)


def test_opic_all_dangling_uniform(spark):
    # no edges at all: every round the virtual page re-splits the whole pot;
    # cash stays uniform, history grows by one pot per round
    from eget_spark.operators.graph import opic_fixed

    ids = [0, 1, 2, 3]
    res = {
        r["id"]: (r["cash_fp"], r["hist_fp"])
        for r in opic_fixed(
            _nodes_df(spark, ids), _edges_df(spark, []), n_iter=3
        ).collect()
    }
    pot = 10**12 // 4
    assert res == {i: (pot, 3 * pot) for i in ids}


def test_opic_importance_orders_hubs_first(spark):
    # a star: everyone links to 0 -> node 0 must end with the top opic_fp
    from eget_spark.operators.graph import opic_fixed

    ids = [0, 1, 2, 3, 4]
    pairs = [(i, 0) for i in ids[1:]]
    rows = opic_fixed(_nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=4).collect()
    top = max(rows, key=lambda r: r["opic_fp"])
    assert top["id"] == 0


def _py_weighted_pr(ids, wedges, n_iter=5, scale=10**12, dn=17, dd=20):
    """Integer weighted-PageRank oracle; wedges = {(s,d): w}."""
    n = len(ids)
    wout: dict = {}
    for (s, _), w in wedges.items():
        wout[s] = wout.get(s, 0) + w
    base = (scale * (dd - dn)) // dd // n
    pr = {i: scale // n for i in ids}
    for _ in range(n_iter):
        dang = sum(p for i, p in pr.items() if i not in wout)
        contrib: dict = {}
        for (s, d), w in wedges.items():
            contrib[d] = contrib.get(d, 0) + (pr[s] * w) // wout[s]
        pr = {
            i: base + (dn * (contrib.get(i, 0) + dang // n)) // dd
            for i in ids
        }
    return pr


def test_collapse_to_hosts(spark):
    from eget_spark.operators.graph import collapse_to_hosts

    rows = [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a"), ("b", "c")]
    df = spark.createDataFrame(rows, "src_host string, dst_host string")
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in collapse_to_hosts(df).collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}


def test_weighted_pagerank_matches_python(spark):
    from eget_spark.operators.graph import pagerank_weighted_fixed

    ids = list(range(8))
    wedges = {(i, (i * 3 + 1) % 8): (i % 4) + 1 for i in range(6)}
    wedges[(0, 5)] = 7  # a second out-edge for node 0
    nodes = _nodes_df(spark, ids)
    edges = spark.createDataFrame(
        [(s, d, w) for (s, d), w in wedges.items()],
        "src long, dst long, weight long",
    )
    got = {
        r["id"]: r["pr_fp"]
        for r in pagerank_weighted_fixed(nodes, edges, n_iter=5).collect()
    }
    assert got == _py_weighted_pr(ids, wedges)


def test_weighted_pagerank_uniform_weights_equals_unweighted(spark):
    # weight=1 everywhere must reproduce pagerank_fixed exactly
    from eget_spark.operators.graph import pagerank_weighted_fixed

    ids = list(range(10))
    pairs = [(i, (i * 7 + 13) % 10) for i in ids] + [(i, (i * 11 + 5) % 10) for i in ids]
    # dedup pairs: parallel edges differ between the two formulations
    pairs = sorted(set(pairs))
    nodes = _nodes_df(spark, ids)
    uw = {
        r["id"]: r["pr_fp"]
        for r in pagerank_fixed(nodes, _edges_df(spark, pairs), n_iter=4).collect()
    }
    wedges = spark.createDataFrame(
        [(s, d, 1) for s, d in pairs], "src long, dst long, weight long"
    )
    w = {
        r["id"]: r["pr_fp"]
        for r in pagerank_weighted_fixed(nodes, wedges, n_iter=4).collect()
    }
    assert w == uw


# --- triangle counting / clustering coefficient ------------------------------


def test_triangle_counts_hand_graph(spark):
    from eget_spark.operators.graph import triangle_counts

    # 4-clique {0,1,2,3} (4 triangles, 3 through each node), a pendant 4
    # hanging off 0, an isolate 5; parallel + reverse + self edges must
    # collapse away
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
         (2, 3), (3, 2), (0, 4), (4, 4)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    rows = {r["id"]: r for r in triangle_counts(nodes, edges).collect()}
    assert [rows[i]["triangles"] for i in range(6)] == [3, 3, 3, 3, 0, 0]
    assert [rows[i]["degree"] for i in range(6)] == [4, 3, 3, 3, 1, 0]
    # clique member 1: deg 3 -> 3 of 3 possible neighbor pairs linked
    assert rows[1]["clustering"] == 1.0
    # node 0: deg 4 -> 3 triangles of 6 possible pairs
    assert rows[0]["clustering"] == 0.5
    assert rows[4]["clustering"] == 0.0 and rows[5]["clustering"] == 0.0


def test_triangle_counts_matches_bruteforce(spark):
    import itertools
    import random

    from eget_spark.operators.graph import triangle_counts

    rnd = random.Random(7)
    n = 24
    pairs = [(a, b) for a in range(n) for b in range(n) if a != b]
    edges_py = sorted(rnd.sample(pairs, 90))
    und = {(min(a, b), max(a, b)) for a, b in edges_py}
    tri_py = {i: 0 for i in range(n)}
    for a, b, c in itertools.combinations(range(n), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            tri_py[a] += 1
            tri_py[b] += 1
            tri_py[c] += 1
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    rows = {r["id"]: r for r in triangle_counts(nodes, edges).collect()}
    for i in range(n):
        assert rows[i]["triangles"] == tri_py[i], i
        deg = sum(1 for p in und if i in p)
        assert rows[i]["degree"] == deg


def _peel_coreness(n: int, und: set) -> dict:
    """Exact k-core peeling oracle: repeatedly delete min-degree nodes."""
    adj = {i: set() for i in range(n)}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    core = {i: 0 for i in range(n)}
    deg = {i: len(adj[i]) for i in range(n)}
    alive = set(range(n))
    k = 0
    while alive:
        k = max(k, min(deg[i] for i in alive))
        peel = [i for i in alive if deg[i] <= k]
        while peel:
            i = peel.pop()
            if i not in alive:
                continue
            core[i] = k
            alive.discard(i)
            for j in adj[i]:
                if j in alive:
                    deg[j] -= 1
                    if deg[j] <= k:
                        peel.append(j)
    return core


def test_coreness_hindex_matches_peeling_oracle(spark):
    import random

    from eget_spark.operators.graph import coreness_hindex

    rnd = random.Random(11)
    n = 30
    pairs = [(a, b) for a in range(n) for b in range(n) if a != b]
    edges_py = sorted(rnd.sample(pairs, 140))
    # self-loops and duplicate directions must be ignored per the contract
    edges_py += [(3, 3), (0, 1), (1, 0)]
    und = {(min(a, b), max(a, b)) for a, b in edges_py if a != b}
    want = _peel_coreness(n, und)
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["coreness"]
        for r in coreness_hindex(nodes, edges, n_rounds=20).collect()
    }
    assert got == want


def test_coreness_isolated_and_star(spark):
    from eget_spark.operators.graph import coreness_hindex

    # star: hub 0 with 5 leaves -> everyone coreness 1; node 9 isolated
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(10)], "id long")
    got = {
        r["id"]: r["coreness"]
        for r in coreness_hindex(nodes, edges, n_rounds=6).collect()
    }
    assert got[9] == 0 and all(got[i] == 1 for i in range(6))
    assert all(got[i] == 0 for i in range(6, 10))


def test_hyperball_matches_python_register_oracle(spark):
    import hashlib
    import math

    from eget_spark.operators.graph import hyperball

    p, rounds, m, width = 4, 4, 16, 56
    scale = 1 << (width + 1)
    n = 25
    edges_py = [(i, (i * 3 + 1) % n) for i in range(n)] + [
        (i, (i * i + 2) % n) for i in range(n)
    ]

    def h60(v: int) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    def rho(w: int) -> int:
        return width + 1 if w == 0 else width - w.bit_length() + 1

    # python replication of the sparse register propagation
    regs = {i: {h60(i) & (m - 1): rho(h60(i) >> p)} for i in range(n)}
    succ = {}
    for a, b in edges_py:
        succ.setdefault(a, []).append(b)

    def estimate(r: dict) -> float:
        v_zero = m - len(r)
        ss = sum(1 << (width + 1 - reg) for reg in r.values()) + v_zero * scale
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * float(m) * float(m) * float(scale) / ss
        if raw <= 2.5 * m and v_zero > 0:
            return round(m * math.log(m / v_zero), 2)
        return round(raw, 2)

    ests = {i: [estimate(regs[i])] for i in range(n)}
    for _ in range(rounds):
        new = {}
        for v in range(n):
            merged = dict(regs[v])
            for w in succ.get(v, []):
                for b, rg in regs[w].items():
                    if merged.get(b, 0) < rg:
                        merged[b] = rg
            new[v] = merged
        regs = new
        for i in range(n):
            ests[i].append(estimate(regs[i]))

    want = {}
    for i in range(n):
        e = ests[i]
        harmonic = 0.0
        for t in range(1, rounds + 1):
            harmonic += (e[t] - e[t - 1]) / float(t)
        want[i] = (e[rounds], round(harmonic, 6))

    edges = spark.createDataFrame(edges_py, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: (r["reach_est"], r["harmonic"])
        for r in hyperball(nodes, edges, p=p, n_rounds=rounds).collect()
    }
    assert got == want
    # sketch sanity: the estimate is in the right ballpark of exact reach
    reach = {i: {i} for i in range(n)}
    for _ in range(rounds):
        reach = {
            i: reach[i] | {x for w in succ.get(i, []) for x in reach[w]}
            for i in range(n)
        }
    # m=16 sketches are deliberately tiny here — just pin the right order
    # of magnitude (ratio within 3x of the exact ball size)
    for i in range(n):
        assert got[i][0] >= 1.0
        assert 1 / 3 < got[i][0] / len(reach[i]) < 3


def test_bowtie_matches_python_bfs_oracle(spark):
    from eget_spark.operators.graph import bowtie_classes

    # hand-built bow-tie: SCC {0,1,2}; IN {3,4}; OUT {5,6};
    # TENDRIL {7 (off IN), 8 (into OUT)}; DISC {9, 10<->11}
    edges_py = [
        (0, 1), (1, 2), (2, 0),          # core cycle
        (3, 0), (4, 3),                   # IN chain
        (2, 5), (5, 6),                   # OUT chain
        (3, 7),                           # tendril hanging off IN
        (8, 6),                           # tendril feeding OUT
        (10, 11), (11, 10),               # disconnected 2-cycle
    ]
    n = 12
    want = {
        0: "SCC", 1: "SCC", 2: "SCC",
        3: "IN", 4: "IN",
        5: "OUT", 6: "OUT",
        7: "TENDRIL", 8: "TENDRIL",
        9: "DISC", 10: "DISC", 11: "DISC",
    }
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["bowtie_class"]
        for r in bowtie_classes(nodes, edges, n_rounds=8).collect()
    }
    assert got == want


def test_bowtie_pivot_determinism_and_convergence(spark):
    import random

    from eget_spark.operators.graph import bowtie_classes

    rnd = random.Random(3)
    n = 40
    edges_py = sorted(
        rnd.sample([(a, b) for a in range(n) for b in range(n) if a != b], 120)
    )
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    a = {r["id"]: r["bowtie_class"]
         for r in bowtie_classes(nodes, edges, n_rounds=12).collect()}
    b = {r["id"]: r["bowtie_class"]
         for r in bowtie_classes(nodes, edges, n_rounds=20).collect()}
    # extra rounds past the diameter are no-ops
    assert a == b
    # python oracle: BFS from the same pinned pivot
    succ, pred = {}, {}
    deg = {}
    for s_, d_ in edges_py:
        succ.setdefault(s_, set()).add(d_)
        pred.setdefault(d_, set()).add(s_)
        deg[s_] = deg.get(s_, 0) + 1
        deg[d_] = deg.get(d_, 0) + 1
    pivot = min(i for i in deg if deg[i] == max(deg.values()))

    def bfs(adj):
        seen, todo = {pivot}, [pivot]
        while todo:
            v = todo.pop()
            for w in adj.get(v, ()):  # noqa: B023
                if w not in seen:
                    seen.add(w)
                    todo.append(w)
        return seen

    F_ = bfs(succ)
    B_ = bfs(pred)
    W_ = bfs({k: succ.get(k, set()) | pred.get(k, set())
              for k in range(n)})
    for i in range(n):
        if i in F_ and i in B_:
            assert a[i] == "SCC", i
        elif i in B_:
            assert a[i] == "IN", i
        elif i in F_:
            assert a[i] == "OUT", i
        elif i in W_:
            assert a[i] == "TENDRIL", i
        else:
            assert a[i] == "DISC", i


def _py_lpa(ids, pairs, n_rounds):
    """Deterministic synchronous LPA: simple undirected graph, each node
    adopts the most frequent neighbor label, ties -> smallest label."""
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nbrs: dict[int, set] = {i: set() for i in ids}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    lab = {i: i for i in ids}
    for _ in range(n_rounds):
        nxt = {}
        for v in ids:
            votes: dict[int, int] = {}
            for u in nbrs.get(v, ()):
                votes[lab[u]] = votes.get(lab[u], 0) + 1
            nxt[v] = (
                min(
                    votes,
                    key=lambda L: (-votes[L], L),
                )
                if votes
                else lab[v]
            )
        lab = nxt
    return lab


def test_lpa_two_cliques_with_bridge(spark):
    from eget_spark.operators.graph import label_propagation

    # two 4-cliques joined by one bridge edge: LPA must find exactly the
    # two cliques as communities (labels = each clique's min id)
    ids = list(range(8))
    cl = lambda off: [
        (off + i, off + j) for i in range(4) for j in range(i + 1, 4)
    ]
    pairs = cl(0) + cl(4) + [(3, 4)]
    got = {
        r.id: r.community
        for r in label_propagation(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_rounds=6
        ).collect()
    }
    assert got == _py_lpa(ids, pairs, 6)
    assert {got[i] for i in range(4)} == {0}
    assert {got[i] for i in range(4, 8)} == {4}


def test_lpa_matches_python_oracle_random_graph(spark):
    from eget_spark.operators.graph import label_propagation

    # deterministic arithmetic pseudo-random multigraph, incl. self-loops
    # and duplicate edges that the simple-graph contract must collapse
    ids = list(range(40))
    pairs = []
    for k in range(160):
        pairs.append(((k * k * 7 + 3) % 40, (k * 13 + 5) % 40))
    pairs += [(7, 7), (12, 12)] + pairs[:10]
    for rounds in (1, 2, 5):
        got = {
            r.id: r.community
            for r in label_propagation(
                _nodes_df(spark, ids), _edges_df(spark, pairs), rounds
            ).collect()
        }
        assert got == _py_lpa(ids, pairs, rounds), f"rounds={rounds}"


def test_lpa_isolated_keeps_own_label(spark):
    from eget_spark.operators.graph import label_propagation

    got = {
        r.id: r.community
        for r in label_propagation(
            _nodes_df(spark, [0, 1, 2, 9]),
            _edges_df(spark, [(0, 1), (1, 2)]),
            n_rounds=4,
        ).collect()
    }
    assert got[9] == 9  # isolated: no neighbor vote ever
    assert set(got) == {0, 1, 2, 9}


def _py_modularity(labels, pairs, scale=10**12):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    m = len(und)
    comms = sorted(set(labels.values()))
    out = {}
    for c in comms:
        nodes = {v for v, L in labels.items() if L == c}
        intra = sum(1 for a, b in und if a in nodes and b in nodes)
        deg = sum(1 for a, b in und for x in (a, b) if x in nodes)
        fp = (intra * scale) // m - (deg * deg * scale) // (4 * m * m)
        out[c] = (len(nodes), intra, deg, fp)
    return out


def test_modularity_matches_python_on_lpa_output(spark):
    from eget_spark.operators.graph import (
        community_modularity,
        label_propagation,
    )

    ids = list(range(8))
    cl = lambda off: [
        (off + i, off + j) for i in range(4) for j in range(i + 1, 4)
    ]
    pairs = cl(0) + cl(4) + [(3, 4)]
    nodes, edges = _nodes_df(spark, ids), _edges_df(spark, pairs)
    labels_df = label_propagation(nodes, edges, n_rounds=6)
    got = {
        r.community: (r.n_nodes, r.intra_edges, r.degree_sum, r.modularity_fp)
        for r in community_modularity(labels_df, edges).collect()
    }
    labels = {r.id: r.community for r in labels_df.collect()}
    assert got == _py_modularity(labels, pairs)
    # two balanced cliques with one bridge: known closed form
    # Q = 2 * (6/13 - (13/26)^2) = 12/13 - 1/2
    q = sum(v[3] for v in got.values()) / 10**12
    assert abs(q - (12 / 13 - 0.5)) < 2e-12


def test_modularity_all_one_community_is_near_zero(spark):
    from eget_spark.operators.graph import community_modularity

    # one community holding every node: Q = m/m - (2m/2m)^2 = 0 exactly
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    labels = spark.createDataFrame(
        [(i, 0) for i in range(4)], "id long, community long"
    )
    rows = community_modularity(labels, _edges_df(spark, pairs)).collect()
    assert len(rows) == 1 and rows[0].modularity_fp == 0
    assert rows[0].intra_edges == 5 and rows[0].degree_sum == 10


def test_modularity_singletons_penalized(spark):
    from eget_spark.operators.graph import community_modularity

    # every node its own community: intra = 0, Q strictly negative
    pairs = [(0, 1), (1, 2), (2, 0)]
    labels = spark.createDataFrame(
        [(i, i) for i in range(3)], "id long, community long"
    )
    rows = community_modularity(labels, _edges_df(spark, pairs)).collect()
    assert all(r.intra_edges == 0 for r in rows)
    assert sum(r.modularity_fp for r in rows) < 0


def test_neighborhood_function_matches_python_registers(spark):
    import hashlib
    import math

    from eget_spark.operators.graph import neighborhood_function

    p, rounds, m, width = 4, 4, 16, 56
    scale = 1 << (width + 1)
    n = 25
    edges_py = [(i, (i * 3 + 1) % n) for i in range(n)] + [
        (i, (i * i + 2) % n) for i in range(n)
    ]

    def h60(v: int) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    def rho(w: int) -> int:
        return width + 1 if w == 0 else width - w.bit_length() + 1

    regs = {i: {h60(i) & (m - 1): rho(h60(i) >> p)} for i in range(n)}
    succ = {}
    for a, b in edges_py:
        succ.setdefault(a, []).append(b)

    def estimate(r: dict) -> float:
        v_zero = m - len(r)
        ss = sum(1 << (width + 1 - reg) for reg in r.values()) + v_zero * scale
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * float(m) * float(m) * float(scale) / ss
        if raw <= 2.5 * m and v_zero > 0:
            return round(m * math.log(m / v_zero), 2)
        return round(raw, 2)

    nf = [sum(int(round(estimate(regs[i]) * 100.0)) for i in range(n))]
    for _ in range(rounds):
        new = {}
        for v in range(n):
            merged = dict(regs[v])
            for w in succ.get(v, []):
                for b, rg in regs[w].items():
                    if merged.get(b, 0) < rg:
                        merged[b] = rg
            new[v] = merged
        regs = new
        nf.append(sum(int(round(estimate(regs[i]) * 100.0)) for i in range(n)))

    ratios = [round(x / nf[rounds], 6) for x in nf]
    efft = min(t for t, r in enumerate(ratios) if r >= 0.9)

    edges = spark.createDataFrame(edges_py, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["t"]: (r["nf_centi"], r["ratio"], r["is_eff_diameter"])
        for r in neighborhood_function(
            nodes, edges, p=p, n_rounds=rounds
        ).collect()
    }
    assert got == {
        t: (nf[t], ratios[t], t == efft) for t in range(rounds + 1)
    }
    # exactly one effective-diameter round, final ratio is exactly 1.0
    assert sum(1 for v in got.values() if v[2]) == 1
    assert got[rounds][1] == 1.0


def test_neighborhood_function_path_graph_diameter(spark):
    from eget_spark.operators.graph import neighborhood_function

    # a directed 3-path: balls stop growing after t=3, so the final
    # rounds are flat and the effective diameter lands at t <= 3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    rows = {
        r["t"]: r
        for r in neighborhood_function(nodes, edges, p=4, n_rounds=5).collect()
    }
    assert rows[3]["nf_centi"] == rows[4]["nf_centi"] == rows[5]["nf_centi"]
    eff = [t for t, r in rows.items() if r["is_eff_diameter"]]
    assert len(eff) == 1 and eff[0] <= 3


def _py_assortativity(pairs):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(und)
    s_jk = sum(deg[a] * deg[b] for a, b in und)
    s_sum = sum(deg[a] + deg[b] for a, b in und)
    s_sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in und)
    den = 2 * m * s_sq - s_sum * s_sum
    r = round((4 * m * s_jk - s_sum * s_sum) / den, 6) if den else None
    return m, s_jk, s_sum, s_sq, r


def test_assortativity_matches_python_oracle(spark):
    from eget_spark.operators.graph import degree_assortativity

    pairs = [((k * k * 5 + 1) % 30, (k * 11 + 3) % 30) for k in range(70)]
    pairs += [(2, 2), (5, 5)] + pairs[:7]  # self-loops + dupes collapse
    got = degree_assortativity(_edges_df(spark, pairs)).collect()[0]
    assert tuple(got) == _py_assortativity(pairs)


def test_assortativity_star_is_minus_one(spark):
    from eget_spark.operators.graph import degree_assortativity

    # a star is maximally disassortative: r = -1 exactly
    pairs = [(0, i) for i in range(1, 7)]
    got = degree_assortativity(_edges_df(spark, pairs)).collect()[0]
    assert got.assortativity == -1.0


def test_assortativity_regular_graph_is_null(spark):
    from eget_spark.operators.graph import degree_assortativity

    # a cycle is 2-regular: zero degree variance -> NULL by contract
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    got = degree_assortativity(_edges_df(spark, pairs)).collect()[0]
    assert got.assortativity is None and got.m_edges == 5


def test_spam_mass_semantics(spark):
    from eget_spark.operators.graph import (
        pagerank_fixed,
        spam_mass,
        trustrank_fixed,
    )

    # farm: nodes 10..14 all link to 9 (high PR, unreachable from trust);
    # trusted core: 0 -> 1 -> 2 cycle seeded at 0
    pairs = [(0, 1), (1, 2), (2, 0)] + [(i, 9) for i in range(10, 15)]
    ids = [0, 1, 2, 9] + list(range(10, 15))
    nodes, edges = _nodes_df(spark, ids), _edges_df(spark, pairs)
    seeds = nodes.where("id = 0")
    pr = pagerank_fixed(nodes, edges, n_iter=5)
    tr = trustrank_fixed(nodes, edges, seeds, n_iter=5)
    got = {r.id: r for r in spam_mass(pr, tr).collect()}
    # the farm target: zero trust -> relative mass exactly 1.0 (1e6)
    assert got[9].tr_fp == 0 and got[9].rel_mass_fp == 10**6
    # trusted nodes: TR >= PR share -> mass clamps to a small value/zero
    assert got[0].rel_mass_fp < 10**5
    # python recomputation of the formula over the exact vectors
    for i in ids:
        want = (max(got[i].pr_fp - got[i].tr_fp, 0) * 10**6) // got[i].pr_fp
        assert got[i].rel_mass_fp == want


def _py_katz(ids, pairs, n_iter=6, num=1, den=8, scale=10**9):
    """Pure-Python mirror of katz_fixed's integer arithmetic."""
    x = {i: scale for i in ids}
    for _ in range(n_iter):
        s: dict[int, int] = {}
        for a, b in pairs:
            s[b] = s.get(b, 0) + x[a]
        x = {i: scale + (num * s.get(i, 0)) // den for i in ids}
    return x


def test_katz_matches_python_oracle(spark):
    from eget_spark.operators.graph import katz_fixed

    ids = list(range(17))
    pairs = [(i, (i * 7 + 13) % 17) for i in ids] + [
        (i, (i * i * 3 + 5) % 17) for i in ids
    ]
    got = {
        r["id"]: r["katz_fp"]
        for r in katz_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=6
        ).collect()
    }
    assert got == _py_katz(ids, pairs, n_iter=6)


def test_katz_path_graph_closed_form(spark):
    """On a directed path 0->1->2->3 with alpha=1/2 and scale divisible
    by 2^3, the converged Katz value is the exact truncated geometric
    sum scale * (2 - 2^-k): floor division never rounds."""
    from eget_spark.operators.graph import katz_fixed

    scale = 2**30
    ids = [0, 1, 2, 3]
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = {
        r["id"]: r["katz_fp"]
        for r in katz_fixed(
            _nodes_df(spark, ids),
            _edges_df(spark, pairs),
            n_iter=6,  # > path length -> converged exactly
            alpha_num=1,
            alpha_den=2,
            scale=scale,
        ).collect()
    }
    assert got[0] == scale
    assert got[1] == scale + scale // 2
    assert got[2] == scale + scale // 2 + scale // 4
    assert got[3] == scale + scale // 2 + scale // 4 + scale // 8


def test_katz_isolated_node_is_beta(spark):
    from eget_spark.operators.graph import katz_fixed

    ids = [0, 1, 9]  # 9 has no in-edges
    pairs = [(0, 1), (9, 0)]  # 9 points out, receives nothing
    got = {
        r["id"]: r["katz_fp"]
        for r in katz_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=4
        ).collect()
    }
    assert got[9] == 10**9


def _py_salsa(ids, pairs, n_iter=4, scale=10**12):
    """Pure-Python mirror of salsa_fixed's integer arithmetic."""
    ind: dict[int, int] = {}
    outd: dict[int, int] = {}
    for a, b in pairs:
        outd[a] = outd.get(a, 0) + 1
        ind[b] = ind.get(b, 0) + 1
    a_vec = {i: scale for i in ids}
    h_vec = {i: 0 for i in ids}
    for _ in range(n_iter):
        h: dict[int, int] = {}
        for u, v in pairs:
            h[u] = h.get(u, 0) + a_vec[v] // ind[v]
        h_vec = {i: h.get(i, 0) for i in ids}
        a: dict[int, int] = {}
        for u, v in pairs:
            a[v] = a.get(v, 0) + h_vec[u] // outd[u]
        a_vec = {i: a.get(i, 0) for i in ids}
    return a_vec, h_vec


def test_salsa_matches_python_oracle(spark):
    from eget_spark.operators.graph import salsa_fixed

    ids = list(range(15))
    pairs = [(i, (i * 7 + 13) % 15) for i in ids] + [
        (i, (i * i * 3 + 5) % 15) for i in ids
    ]
    got = {
        r["id"]: (r["auth_fp"], r["hub_fp"])
        for r in salsa_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=4
        ).collect()
    }
    a, h = _py_salsa(ids, pairs, n_iter=4)
    assert got == {i: (a[i], h[i]) for i in ids}


def test_salsa_regular_bipartite_fixed_point(spark):
    """On the 2x2 complete bipartite graph every degree is 2: the
    uniform start vector is EXACTLY stationary (a(v) = scale forever)
    because each half-step splits and re-merges mass without remainder.
    Pins that the walk is mass-preserving, not HITS-style growing."""
    from eget_spark.operators.graph import salsa_fixed

    ids = [0, 1, 2, 3]
    pairs = [(0, 2), (0, 3), (1, 2), (1, 3)]
    scale = 10**12
    got = {
        r["id"]: (r["auth_fp"], r["hub_fp"])
        for r in salsa_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=5, scale=scale
        ).collect()
    }
    # authorities 2,3 hold scale each; hubs 0,1 hold scale each
    assert got[2][0] == scale and got[3][0] == scale
    assert got[0][1] == scale and got[1][1] == scale
    # outside the bipartite support side: hubs have no in-edges -> auth 0
    assert got[0][0] == 0 and got[2][1] == 0


def test_salsa_mass_never_grows(spark):
    """Floor division only loses mass: total authority mass after any
    number of iterations is <= the starting mass (the no-overflow
    contract HITS cannot make)."""
    from eget_spark.operators.graph import salsa_fixed

    ids = list(range(12))
    pairs = [(i, (i * 5 + 7) % 12) for i in ids] + [
        (i, (i * i + 1) % 12) for i in ids
    ]
    scale = 10**12
    res = salsa_fixed(
        _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=6, scale=scale
    )
    total = res.agg(F.sum("auth_fp").alias("s")).collect()[0]["s"]
    assert total <= len(ids) * scale


def test_cocitation_pairs_small_graph(spark):
    from eget_spark.operators.graph import cocitation_pairs

    # 1 and 2 are co-cited by 10 and 11; 1 and 3 co-cited by 10 only.
    # 10 and 11 both link to 1 and 2 -> coupling(10,11) = 2.
    edges = spark.createDataFrame(
        [
            (10, 1), (10, 2), (10, 3),
            (11, 1), (11, 2),
            (5, 5),            # self-loop: dropped
            (10, 1),           # duplicate edge: collapsed
        ],
        "src long, dst long",
    )
    got = {
        (r.a, r.b): (r.cocitations, r.couplings, r.rnk)
        for r in cocitation_pairs(edges, max_degree=64, top_k=10).collect()
    }
    assert got[(1, 2)][:2] == (2, 0)
    assert got[(1, 3)][:2] == (1, 0)
    assert got[(2, 3)][:2] == (1, 0)
    assert got[(10, 11)][:2] == (0, 2)
    # ordering: (1,2) has the highest cocitation count -> rank 1
    assert got[(1, 2)][2] == 1


def test_cocitation_hot_pivot_excluded(spark):
    from eget_spark.operators.graph import cocitation_pairs

    # src=1 (a links directory) has out-degree 4 > cap 3: its targets
    # are NOT co-cited through it; src=2 (out-degree 2) still pairs its
    # two targets.  Symmetrically dst=50 has in-degree 4 > cap 3, so its
    # citers get no coupling through it; dst=60's two citers do.
    rows = (
        [(1, d) for d in range(10, 14)]
        + [(2, 20), (2, 21)]
        + [(s, 50) for s in range(30, 34)]
        + [(40, 60), (41, 60)]
    )
    edges = spark.createDataFrame(rows, "src long, dst long")
    out = cocitation_pairs(edges, max_degree=3, top_k=50).collect()
    cocited = {(r.a, r.b) for r in out if r.cocitations > 0}
    coupled = {(r.a, r.b) for r in out if r.couplings > 0}
    assert cocited == {(20, 21)}
    assert coupled == {(40, 41)}


def test_ktruss_matches_python_peeling(spark):
    """k-truss vs a brute-force Python peeler on a graph mixing a
    4-clique (survives k=4), a triangle pendant (survives k=3 only),
    and a star (no triangles — dropped immediately)."""
    from itertools import combinations

    from eget_spark.operators.graph import ktruss

    clique = list(combinations([0, 1, 2, 3], 2))
    tri = [(4, 5), (5, 6), (4, 6)]
    star = [(7, 8), (7, 9), (7, 10), (7, 11)]
    bridge = [(3, 4)]
    edge_list = clique + tri + star + bridge

    def py_truss(es, k, rounds=6):
        cur = {tuple(sorted(e)) for e in es}
        for _ in range(rounds):
            adj = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            sup = {
                e: len(adj[e[0]] & adj[e[1]])
                for e in cur
            }
            cur = {e for e in cur if sup[e] >= k - 2}
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {e: len(adj[e[0]] & adj[e[1]]) for e in cur}

    df = spark.createDataFrame(edge_list, "src long, dst long")
    for k in (3, 4, 5):
        got = {
            (r.a, r.b): r.support for r in ktruss(df, k=k).collect()
        }
        assert got == py_truss(edge_list, k), f"k={k}"
    # semantic shape: k=3 keeps clique+triangle, drops star+bridge;
    # k=4 keeps only the clique; k=5 empties the graph
    assert set(py_truss(edge_list, 3)) == set(
        tuple(sorted(e)) for e in clique + tri
    )
    assert set(py_truss(edge_list, 4)) == set(clique)
    assert py_truss(edge_list, 5) == {}


def test_ktruss_direction_and_duplicates_ignored(spark):
    """Directed duplicates and self-loops collapse to the simple
    undirected graph before peeling."""
    from eget_spark.operators.graph import ktruss

    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 2), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.a, r.b): r.support for r in ktruss(df, k=3).collect()}
    assert got == {(0, 1): 1, (1, 2): 1, (0, 2): 1}


def _py_components(pairs):
    """Union-find components: node -> min node id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in pairs:
        if s == d:
            continue
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {n: find(n) for n in parent}


def test_connected_components_two_islands(spark):
    from eget_spark.operators.graph import connected_components

    # two components: a 4-cycle {0..3} and a path {10,11,12}; 5 isolated
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 12)]
    nodes = _nodes_df(spark, [0, 1, 2, 3, 10, 11, 12, 99])
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            _edges_df(spark, pairs), nodes, n_iter=4
        ).collect()
    }
    want = _py_components(pairs)
    want[99] = 99  # isolated keeps its own label
    assert got == want


def test_connected_components_long_path_pointer_jump(spark):
    from eget_spark.operators.graph import connected_components

    # a 40-node path needs 40 rounds of plain propagation but
    # 2^6-1 = 63 >= 40 hops with pointer jumping: 6 rounds must converge
    pairs = [(i, i + 1) for i in range(40)]
    got = connected_components(_edges_df(spark, pairs), n_iter=6).collect()
    assert {r["comp"] for r in got} == {0}
    assert len(got) == 41


def test_connected_components_direction_and_self_loops(spark):
    from eget_spark.operators.graph import connected_components

    # direction ignored, self-loops dropped, duplicate edges collapsed
    pairs = [(5, 5), (2, 1), (1, 2), (3, 2), (7, 7)]
    nodes = _nodes_df(spark, [1, 2, 3, 5, 7])
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            _edges_df(spark, pairs), nodes, n_iter=4
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7}


def _py_linkpred(pairs, cap=32, k=100):
    import math

    und = set()
    for s, d in pairs:
        if s != d:
            und.add((min(s, d), max(s, d)))
    nbrs: dict[int, set] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    deg = {n: len(v) for n, v in nbrs.items()}
    scores: dict[tuple, list] = {}
    for z, nb in nbrs.items():
        if deg[z] > cap:
            continue
        nb_sorted = sorted(nb)
        for i, a in enumerate(nb_sorted):
            for b in nb_sorted[i + 1 :]:
                rec = scores.setdefault((a, b), [0, 0])
                rec[0] += 1
                rec[1] += round(1e6 / math.log(deg[z]))
    rows = []
    for (a, b), (cn, aa) in scores.items():
        rows.append(
            (
                a,
                b,
                cn,
                round(cn / (deg[a] + deg[b] - cn), 6),
                aa,
                deg[a] * deg[b],
                (a, b) in und,
            )
        )
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    return rows[:k]


def test_link_prediction_matches_python_oracle(spark):
    from eget_spark.operators.graph import link_prediction_scores

    pairs = [
        (i, (i * 7 + 13) % 20) for i in range(20)
    ] + [(i, (i * i * 3 + 5) % 20) for i in range(20)]
    got = [
        (
            r["a"], r["b"], r["cn"], r["jaccard"], r["aa_micro"],
            r["pref_attach"], r["is_edge"],
        )
        for r in link_prediction_scores(_edges_df(spark, pairs), k=50).collect()
    ]
    assert got == _py_linkpred(pairs, k=50)
    # sanity: at least one non-edge pair is predicted
    assert any(not r[6] for r in got)


def test_link_prediction_hot_pivot_excluded(spark):
    from eget_spark.operators.graph import link_prediction_scores

    # star center 0 with 40 leaves (deg 40 > cap 32) contributes no
    # pairs; the triangle 100-101-102 still scores
    pairs = [(0, i) for i in range(1, 41)] + [
        (100, 101), (101, 102), (100, 102),
    ]
    got = link_prediction_scores(
        _edges_df(spark, pairs), max_degree=32, k=100
    ).collect()
    assert {(r["a"], r["b"]) for r in got} == {
        (100, 101), (100, 102), (101, 102),
    }
    # each triangle edge: 1 common neighbor of degree 2
    for r in got:
        assert r["cn"] == 1 and r["aa_micro"] == round(1e6 / __import__("math").log(2))
        assert r["jaccard"] == round(1 / 3, 6) and r["is_edge"]


def _py_simrank(ids, pairs, n_iter=3, scale=10**12, k=100):
    e = sorted({(s, d) for s, d in pairs if s != d})
    inn: dict[int, list] = {}
    for s, d in e:
        inn.setdefault(d, []).append(s)
    sim = {(i, i): scale for i in ids}
    for _ in range(n_iter):
        new = {(i, i): scale for i in ids}
        for a in inn:
            for b in inn:
                if a == b:
                    continue
                tot = sum(
                    sim.get((i, j), 0) for i in inn[a] for j in inn[b]
                )
                s = (4 * tot) // (5 * len(inn[a]) * len(inn[b]))
                if s > 0:
                    new[(a, b)] = s
        sim = new
    rows = sorted(
        ((a, b, s) for (a, b), s in sim.items() if a < b),
        key=lambda r: (-r[2], r[0], r[1]),
    )
    return rows[:k]


def test_simrank_matches_python_oracle(spark):
    from eget_spark.operators.graph import simrank_fixed

    ids = list(range(12))
    pairs = [(i, (i * 7 + 13) % 12) for i in ids] + [
        (i, (i * i * 3 + 5) % 12) for i in ids
    ]
    got = [
        (r["a"], r["b"], r["sim_fp"])
        for r in simrank_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=3
        ).collect()
    ]
    assert got == _py_simrank(ids, pairs)
    assert got  # non-degenerate: some pair shares in-neighbors


def test_simrank_shared_citer_closed_form(spark):
    from eget_spark.operators.graph import simrank_fixed

    # 0 -> 1 and 0 -> 2: I(1)=I(2)={0}, so s(1,2) = C * s(0,0) = 0.8
    got = simrank_fixed(
        _nodes_df(spark, [0, 1, 2]),
        _edges_df(spark, [(0, 1), (0, 2)]),
        n_iter=1,
    ).collect()
    assert [(r["a"], r["b"], r["sim_fp"]) for r in got] == [
        (1, 2, (4 * 10**12) // 5)
    ]


def test_simrank_monotone_iterates(spark):
    from eget_spark.operators.graph import simrank_fixed

    ids = list(range(8))
    pairs = [(i, (i * 3 + 1) % 8) for i in ids] + [(i, (i + 5) % 8) for i in ids]
    one = {
        (r["a"], r["b"]): r["sim_fp"]
        for r in simrank_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=1
        ).collect()
    }
    three = {
        (r["a"], r["b"]): r["sim_fp"]
        for r in simrank_fixed(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=3
        ).collect()
    }
    # Jeh-Widom: iterates rise monotonically toward the fixpoint
    # (integer truncation can shave <= a few units of 1e-12; allow it)
    for key, s1 in one.items():
        assert three.get(key, 0) >= s1 - 5


def _py_wl(ids, pairs, n_iter=3):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    e = sorted({(s, d) for s, d in pairs if s != d})
    und = {(min(s, d), max(s, d)) for s, d in e}
    nbrs: dict[int, list] = {i: [] for i in ids}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    col = {i: h60(str(len(nbrs.get(i, [])))) for i in ids}
    for _ in range(n_iter):
        new = {}
        for v in ids:
            hs = [col[u] % (1 << 40) for u in nbrs.get(v, [])]
            if hs:
                new[v] = h60(f"{col[v]}:{sum(hs)}:{len(hs)}")
            else:
                new[v] = h60(f"{col[v]}:0:0")
        col = new
    return col


def test_wl_colors_match_python_replay(spark):
    from eget_spark.operators.graph import wl_colors

    ids = list(range(16))
    pairs = [(i, (i * 7 + 13) % 16) for i in ids] + [
        (i, (i * i * 3 + 5) % 16) for i in ids
    ]
    got = {
        r["id"]: r["color"]
        for r in wl_colors(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_iter=3
        ).collect()
    }
    assert got == _py_wl(ids, pairs)


def test_wl_symmetric_nodes_share_color(spark):
    from eget_spark.operators.graph import wl_colors

    # two disjoint 3-cycles: all six nodes structurally identical ->
    # ONE color class; the path 10-11-12 yields center != endpoints
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3),
             (10, 11), (11, 12)]
    got = {
        r["id"]: r["color"]
        for r in wl_colors(
            _nodes_df(spark, [0, 1, 2, 3, 4, 5, 10, 11, 12]),
            _edges_df(spark, pairs),
            n_iter=3,
        ).collect()
    }
    assert len({got[i] for i in range(6)}) == 1
    assert got[10] == got[12] != got[11]


def test_wl_refinement_separates_rounds(spark):
    from eget_spark.operators.graph import wl_colors

    # star center vs leaves: separated at round 0 already (degrees);
    # a 6-path's distance-to-end classes separate only with rounds
    pairs = [(i, i + 1) for i in range(6)]
    nodes = _nodes_df(spark, list(range(7)))
    r1 = {
        r["id"]: r["color"]
        for r in wl_colors(nodes, _edges_df(spark, pairs), n_iter=1).collect()
    }
    r3 = {
        r["id"]: r["color"]
        for r in wl_colors(nodes, _edges_df(spark, pairs), n_iter=3).collect()
    }
    # mirror symmetry always holds: i and 6-i share colors
    for i in range(7):
        assert r3[i] == r3[6 - i]
    # more rounds refine: class count grows from r1 to r3
    assert len(set(r3.values())) > len(set(r1.values()))
