"""Batched property tests for the round-5 operators (TrustRank, budget
apportionment, mirror hosts, striped shards, novelty, EWMA): seeded
random cases against independent pure-Python references — the
test_normalize_property.py discipline (a handful of Spark jobs over
generated batches instead of per-example hypothesis rounds)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


# --- budget apportionment ------------------------------------------------------


def _py_apportion(weights: dict, b: int) -> dict:
    w_tot = sum(weights.values())
    if w_tot <= 0:
        n = len(weights)
        base = {k: b // n for k in weights}
        left = b - sum(base.values())
        for k in sorted(weights)[:left]:
            base[k] += 1
        return base
    base = {k: (b * w) // w_tot for k, w in weights.items()}
    rem = {k: (b * w) % w_tot for k, w in weights.items()}
    left = b - sum(base.values())
    for k in sorted(weights, key=lambda k: (-rem[k], k))[:left]:
        base[k] += 1
    return base


def test_apportion_random_cases(spark):
    from eget_spark.operators.politeness import apportion_budget

    rng = random.Random(42)
    for case in range(6):
        n = rng.randint(1, 30)
        weights = {f"h{i:02d}": rng.randint(0, 10**6) for i in range(n)}
        b = rng.randint(0, 10**5)
        df = spark.createDataFrame(
            list(weights.items()), "host string, weight long"
        )
        got = {
            r["key"]: r["budget"]
            for r in apportion_budget(df, b, "host", "weight").collect()
        }
        assert got == _py_apportion(weights, b), (case, b)
        assert sum(got.values()) == b


# --- striped shards -------------------------------------------------------------


def test_striped_shards_random_cases(spark):
    from eget_spark.operators.packing import striped_shards

    rng = random.Random(43)
    for case in range(4):
        n = rng.randint(1, 120)
        shards = rng.randint(1, 9)
        rows = [(i, rng.randint(0, 10**4)) for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, nb long")
        got = {
            r["id"]: r["shard"]
            for r in striped_shards(df, "doc_id", "nb", shards).collect()
        }
        order = sorted(rows, key=lambda r: (-r[1], r[0]))
        want = {rid: i % shards for i, (rid, _) in enumerate(order)}
        assert got == want, case


# --- mirror hosts ---------------------------------------------------------------


def test_mirror_hosts_random_cases(spark):
    from eget_spark.operators.mirrors import mirror_host_pairs

    rng = random.Random(44)
    for case in range(4):
        hosts = [f"h{i}" for i in range(rng.randint(2, 6))]
        texts = [f"t{i}" for i in range(rng.randint(1, 12))]
        rows = [
            (rng.choice(hosts), rng.choice(texts))
            for _ in range(rng.randint(1, 60))
        ]
        cap = rng.choice([None, 2, 3])
        df = spark.createDataFrame(rows, "host string, text string")
        got = {
            (r["host_a"], r["host_b"]): (
                r["n_a"], r["n_b"], r["n_common"], r["jac_permille"]
            )
            for r in mirror_host_pairs(
                df, "host", "text", max_hosts_per_hash=cap
            ).collect()
        }
        sets: dict[str, set] = {}
        for h, t in rows:
            sets.setdefault(h, set()).add(t)
        shared: dict[str, set] = {}
        for h, ts in sets.items():
            for t in ts:
                shared.setdefault(t, set()).add(h)
        want = {}
        hs = sorted(sets)
        for i, a in enumerate(hs):
            for b in hs[i + 1 :]:
                common = {
                    t
                    for t in sets[a] & sets[b]
                    if cap is None or len(shared[t]) <= cap
                }
                if common:
                    u = len(sets[a]) + len(sets[b]) - len(common)
                    want[(a, b)] = (
                        len(sets[a]),
                        len(sets[b]),
                        len(common),
                        (1000 * len(common)) // u,
                    )
        assert got == want, case


# --- trustrank ------------------------------------------------------------------


def _py_trustrank(ids, pairs, seeds, n_iter, num=17, den=20, scale=10**12):
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


def test_trustrank_random_graphs(spark):
    from eget_spark.operators.graph import trustrank_fixed

    rng = random.Random(45)
    for case in range(3):
        n = rng.randint(4, 16)
        ids = list(range(n))
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 3 * n))
        ]
        seeds = sorted(rng.sample(ids, rng.randint(1, max(1, n // 3))))
        nodes = spark.createDataFrame([(i,) for i in ids], "id long")
        edges = spark.createDataFrame(pairs, "src long, dst long")
        seed_df = spark.createDataFrame([(i,) for i in seeds], "id long")
        got = {
            r["id"]: r["tr_fp"]
            for r in trustrank_fixed(nodes, edges, seed_df, n_iter=3).collect()
        }
        want = _py_trustrank(ids, pairs, set(seeds), 3)
        assert got == want, case
        # trust mass never exceeds the teleport budget's fixpoint bound
        assert all(v >= 0 for v in got.values())


# --- n-gram novelty --------------------------------------------------------------


def test_ngram_novelty_random_corpora(spark):
    from eget_spark.operators.novelty import ngram_novelty

    rng = random.Random(46)
    vocab = [f"w{i}" for i in range(9)]
    for case in range(3):
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 10))))
            for i in range(rng.randint(1, 25))
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["id"]: (r["n_grams"], r["n_novel"], r["novelty_permille"])
            for r in ngram_novelty(df, "doc_id", "text", 3).collect()
        }

        def grams(text, k=3):
            toks = text.split()
            if len(toks) < k:
                return {" ".join(toks)}
            return {
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            }

        gsets = {i: grams(t) for i, t in rows}
        first: dict[str, int] = {}
        for i in sorted(gsets):
            for g in gsets[i]:
                first.setdefault(g, i)
        want = {}
        for i, gs in gsets.items():
            novel = sum(1 for g in gs if first[g] == i)
            want[i] = (len(gs), novel, (1000 * novel) // len(gs))
        assert got == want, case
