"""Deterministic stratified sampling invariants."""

from __future__ import annotations

from eget_spark.operators.sampling import stratified_sample


def _rows(df):
    return sorted((r["source"], r["doc_id"]) for r in df.collect())


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 5}") for i in range(200)], "doc_id long, source string"
    )
    a = _rows(stratified_sample(df, "source", 7, "doc_id", seed="x"))
    b = _rows(stratified_sample(df.repartition(13), "source", 7, "doc_id", seed="x"))
    assert a == b  # partitioning-independent
    per = {}
    for s, _ in a:
        per[s] = per.get(s, 0) + 1
    assert per == {f"s{k}": 7 for k in range(5)}
    # different seed -> (almost surely) different selection
    c = _rows(stratified_sample(df, "source", 7, "doc_id", seed="y"))
    assert c != a
    # a group smaller than n keeps all its rows
    small = spark.createDataFrame(
        [(1, "only"), (2, "only")], "doc_id long, source string"
    )
    assert len(_rows(stratified_sample(small, "source", 7, "doc_id"))) == 2


def test_proportional_mix_targets_and_determinism(spark):
    from eget_spark.operators.sampling import proportional_mix

    df = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(100)], "id long, g string"
    )
    out = proportional_mix(df, "g", {"g0": 0.5, "g1": 0.3, "g2": 0.2}, 20, "id")
    counts = {r["g"]: r["n"] for r in out.groupBy("g").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"g0": 10, "g1": 6, "g2": 4}  # g3 dropped entirely
    # deterministic: same rows on re-run
    again = proportional_mix(df, "g", {"g0": 0.5, "g1": 0.3, "g2": 0.2}, 20, "id")
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )
    # undersized stratum contributes everything it has
    tiny = proportional_mix(df, "g", {"g0": 1.0}, 200, "id")
    assert tiny.count() == 25
    # empty weights -> empty result
    assert proportional_mix(df, "g", {}, 20, "id").count() == 0


def test_token_budget_sample_prefix_semantics(spark):
    import hashlib

    from eget_spark.operators.sampling import token_budget_sample

    rows = [(i, f"g{i % 3}", 10 + (i * 7) % 40) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    budget = 120
    out = token_budget_sample(df, "source", budget, "doc_id", "n_tokens", seed="t")
    got = sorted((r["source"], r["doc_id"]) for r in out.collect())

    # python oracle: per-stratum md5 order, inclusive running sum <= budget
    want = []
    for g in ("g0", "g1", "g2"):
        members = sorted(
            (r for r in rows if r[1] == g),
            key=lambda r: (hashlib.md5(f"t{r[0]}".encode()).hexdigest(), r[0]),
        )
        run = 0
        for did, _, k in members:
            run += k
            if run > budget:
                break
            want.append((g, did))
    assert got == sorted(want)
    # each kept stratum is within budget and nonempty here
    sums = {}
    for (g, did) in got:
        sums[g] = sums.get(g, 0) + next(r[2] for r in rows if r[0] == did)
    assert all(s <= budget for s in sums.values()) and len(sums) == 3

    # pinned edge: an oversized FIRST row empties its stratum
    big = spark.createDataFrame(
        [(1, "x", 999), (2, "x", 1)], "doc_id long, source string, n_tokens long"
    )
    first = sorted(
        [1, 2], key=lambda i: (hashlib.md5(f"t{i}".encode()).hexdigest(), i)
    )[0]
    kept = token_budget_sample(big, "source", 100, "doc_id", "n_tokens", seed="t")
    if first == 1:
        assert kept.count() == 0
    else:
        assert [r["doc_id"] for r in kept.collect()] == [2]


def test_bernoulli_sample_matches_hash_oracle_and_edges(spark):
    import hashlib

    from pyspark.sql import functions as F

    from eget_spark.operators.sampling import bernoulli_sample

    rows = [(i, (1 + i % 20) / 20.0) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, p double")
    got = sorted(r["id"] for r in bernoulli_sample(df, "id", "p", seed="s").collect())
    want = [
        i
        for i, p in rows
        if int(hashlib.md5(f"s{i}".encode()).hexdigest()[:15], 16)
        < int(p * (1 << 60))
    ]
    assert got == want
    # partition-layout invariance (the property df.sample lacks)
    again = sorted(
        r["id"]
        for r in bernoulli_sample(df.repartition(17), "id", "p", seed="s").collect()
    )
    assert again == got
    # p>=1 keeps everything, p<=0 keeps nothing
    assert bernoulli_sample(df, "id", F.lit(1.0), seed="s").count() == 300
    assert bernoulli_sample(df, "id", F.lit(0.0), seed="s").count() == 0
    assert bernoulli_sample(df, "id", F.lit(-0.5), seed="s").count() == 0


def test_split_by_group_consistent_and_matches_oracle(spark):
    import hashlib

    from eget_spark.operators.sampling import split_by_group

    df = spark.createDataFrame(
        [(i, f"h{i % 37}") for i in range(400)], "id long, host string"
    )
    out = split_by_group(df, "host", seed="q").collect()
    names = ["train", "val", "test"]
    for r in out:
        b = int(hashlib.md5(f"q{r['host']}".encode()).hexdigest()[:15], 16) % 10
        want = names[0] if b < 8 else names[1] if b < 9 else names[2]
        assert r["split"] == want
    # every member of a group lands in the same split (leakage-safety)
    per_host = {}
    for r in out:
        per_host.setdefault(r["host"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_host.values())
    # custom weights/names + validation
    w = split_by_group(df, "host", weights=[1, 1], names=["a", "b"], seed="q")
    assert set(r["split"] for r in w.collect()) <= {"a", "b"}
    import pytest

    with pytest.raises(ValueError):
        split_by_group(df, "host", weights=[1, 2], names=["only"])


def test_split_by_group_null_group_single_deterministic_split(spark):
    import hashlib

    from eget_spark.operators.sampling import split_by_group

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "h")], "id long, g string"
    )
    got = {r["id"]: r["split"] for r in split_by_group(df, "g", seed="q").collect()}
    b = int(hashlib.md5(b"q").hexdigest()[:15], 16) % 10  # NULL hashes as ""
    want = "train" if b < 8 else "val" if b < 9 else "test"
    assert got[1] == want and got[2] == want and got[3] is not None


def _unimax_greedy(sizes: dict[str, int], budget: int, cap_ppm: int):
    """Reference implementation: the paper's ascending greedy, exact
    integers with the pinned remainder rule."""
    caps = {g: n * cap_ppm // 1_000_000 for g, n in sizes.items()}
    order = sorted(caps, key=lambda g: (caps[g], g))
    alloc: dict[str, int] = {}
    # find the capped prefix exactly as the closed form does
    total = len(order)
    s = 0
    k = 0
    for i, g in enumerate(order, 1):
        if s + caps[g] + caps[g] * (total - i) <= budget:
            s += caps[g]
            alloc[g] = caps[g]
            k = i
        else:
            break
    rest = order[k:]
    if rest:
        rem = budget - s
        base, extra = divmod(rem, len(rest))
        for j, g in enumerate(rest):
            alloc[g] = base + (1 if j < extra else 0)
    return alloc


def test_unimax_matches_greedy_and_budget(spark):
    from eget_spark.operators.sampling import unimax_allocation

    sizes = {"a": 100, "b": 250, "c": 900, "d": 900, "e": 40}
    rows = [
        (f"{g}{i}", g, n // 10) for g, n in sizes.items() for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id string, grp string, toks long")
    budget = 1200
    out = {
        r.grp: r
        for r in unimax_allocation(
            df, "grp", "toks", budget, max_epochs_ppm=1_500_000
        ).collect()
    }
    want = _unimax_greedy(sizes, budget, 1_500_000)
    assert {g: r.alloc_tokens for g, r in out.items()} == want
    # budget fully spent (total capacity exceeds the budget here)
    assert sum(r.alloc_tokens for r in out.values()) == budget
    # nobody exceeds their cap
    assert all(r.alloc_tokens <= r.cap_tokens for r in out.values())
    # epochs_ppm is the exact floor of alloc*1e6/n_tokens
    for r in out.values():
        assert r.epochs_ppm == r.alloc_tokens * 1_000_000 // r.n_tokens


def test_unimax_budget_exceeds_capacity(spark):
    from eget_spark.operators.sampling import unimax_allocation

    df = spark.createDataFrame(
        [("x1", "x", 50), ("y1", "y", 70)], "id string, grp string, toks long"
    )
    out = unimax_allocation(
        df, "grp", "toks", budget_tokens=10_000, max_epochs_ppm=2_000_000
    ).collect()
    got = {r.grp: r.alloc_tokens for r in out}
    # everyone capped at 2 epochs; the surplus budget goes unspent
    assert got == {"x": 100, "y": 140}


def _py_ares(rows, k, seed=""):
    import hashlib
    import math

    out = []
    for rid, w in rows:
        h = int(hashlib.md5(f"{seed}{rid}".encode()).hexdigest()[:15], 16)
        u = max(h, 1) / float(1 << 60)
        out.append((rid, w, round(math.log(u) / w, 6)))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


def test_ares_matches_python_replay(spark):
    from eget_spark.operators.sampling import weighted_sample_ares

    rows = [(i, (i * 13 + 7) % 40 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = [
        (r["id"], r["weight"], r["es_key"])
        for r in weighted_sample_ares(df, "id", "w", k=10).collect()
    ]
    assert got == _py_ares(rows, 10)


def test_ares_weight_bias(spark):
    from eget_spark.operators.sampling import weighted_sample_ares

    # one row weighs 10^6x the rest: over many seeds it must be chosen
    # nearly always (statistical pin, deterministic given fixed seeds)
    rows = [(0, 1_000_000)] + [(i, 1) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "id long, w long")
    hits = sum(
        any(
            r["id"] == 0
            for r in weighted_sample_ares(df, "id", "w", k=5, seed=str(s)).collect()
        )
        for s in range(8)
    )
    assert hits == 8


def test_ares_k_exceeding_n_returns_all(spark):
    from eget_spark.operators.sampling import weighted_sample_ares

    df = spark.createDataFrame([(1, 2), (2, 3)], "id long, w long")
    assert weighted_sample_ares(df, "id", "w", k=10).count() == 2


# --- IPF raking --------------------------------------------------------------

def _py_ipf(rows, n_rounds=3):
    from collections import Counter

    cells = Counter(rows)
    total = sum(cells.values())
    rs = sorted({r for r, _ in cells})
    cs = sorted({c for _, c in cells})
    t_row = total * 10**6 // len(rs)
    t_col = total * 10**6 // len(cs)
    w = {k: 10**6 for k in cells}
    for _ in range(n_rounds):
        for dim, targ, cats in ((0, t_row, rs), (1, t_col, cs)):
            for cat in cats:
                cur = sum(cells[k] * w[k] for k in cells if k[dim] == cat)
                f = round(targ * 1e6 / cur)
                for k in cells:
                    if k[dim] == cat:
                        w[k] = w[k] * f // 10**6
    return sorted((r, c, cells[(r, c)], w[(r, c)]) for r, c in cells)


IPF_ROWS = (
    [("en", "blog")] * 50 + [("en", "forum")] * 30 + [("en", "news")] * 40
    + [("de", "blog")] * 5 + [("de", "forum")] * 15
    + [("fr", "news")] * 10
)


def _run_ipf(spark, rows, n_rounds=3):
    from eget_spark.operators.sampling import ipf_raking

    df = spark.createDataFrame(rows, "lang string, source string")
    out = ipf_raking(df, "lang", "source", n_rounds=n_rounds).collect()
    return [(r["r"], r["c"], r["n"], r["w_ppm"]) for r in out]


def test_ipf_matches_python_replay(spark):
    assert _run_ipf(spark, IPF_ROWS) == _py_ipf(IPF_ROWS)


def test_ipf_balances_both_marginals(spark):
    got = _run_ipf(spark, IPF_ROWS)
    total = sum(n for _, _, n, _ in got)
    # column marginals exact after the final column sweep (up to floors)
    from collections import defaultdict

    cmass = defaultdict(int)
    rmass = defaultdict(int)
    for r, c, n, w in got:
        cmass[c] += n * w
        rmass[r] += n * w
    t_col = total * 10**6 // 3
    for c, m in cmass.items():
        assert abs(m - t_col) <= total * 3  # DIV-floor dust only
    # row marginals one sweep stale but far closer than the raw counts
    t_row = total * 10**6 // 3
    raw = {"en": 120, "de": 20, "fr": 10}
    for r, m in rmass.items():
        assert abs(m - t_row) < abs(raw[r] * 10**6 - t_row) / 5


def test_ipf_already_balanced_stays_unit(spark):
    rows = ([("a", "x")] * 10 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 10)
    got = _run_ipf(spark, rows)
    assert all(abs(w - 10**6) <= 2 for _, _, _, w in got)
