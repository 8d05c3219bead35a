"""Mirror-host detection vs a pure-Python set oracle."""

from __future__ import annotations

from eget_spark.operators.mirrors import host_content_sets, mirror_host_pairs


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def _py_pairs(rows, max_hosts_per_hash=None, min_permille=0):
    sets: dict[str, set] = {}
    for h, t in rows:
        sets.setdefault(h, set()).add(t)
    shared: dict[str, set] = {}
    for h, ts in sets.items():
        for t in ts:
            shared.setdefault(t, set()).add(h)
    out = {}
    hosts = sorted(sets)
    for i, a in enumerate(hosts):
        for b in hosts[i + 1 :]:
            common = {
                t
                for t in sets[a] & sets[b]
                if max_hosts_per_hash is None
                or len(shared[t]) <= max_hosts_per_hash
            }
            if not common:
                continue
            union = len(sets[a]) + len(sets[b]) - len(common)
            jac = (1000 * len(common)) // union
            if jac >= min_permille:
                out[(a, b)] = (len(sets[a]), len(sets[b]), len(common), jac)
    return out


def _collect(df):
    return {
        (r["host_a"], r["host_b"]): (
            r["n_a"],
            r["n_b"],
            r["n_common"],
            r["jac_permille"],
        )
        for r in df.collect()
    }


def test_mirror_pairs_match_python_oracle(spark):
    rows = [
        ("a", "x"), ("a", "y"), ("a", "z"),
        ("b", "x"), ("b", "y"), ("b", "q"),
        ("c", "q"), ("c", "r"),
        ("d", "unrelated"),
        # duplicate doc rows must not double-count (sets, not bags)
        ("a", "x"), ("b", "x"),
    ]
    got = _collect(mirror_host_pairs(_corpus(spark, rows), "host", "text"))
    assert got == _py_pairs(rows)
    # a∩b = {x,y}: J = 2/(3+3-2) = 0.5 -> 500 permille
    assert got[("a", "b")] == (3, 3, 2, 500)


def test_mirror_full_mirror_is_1000(spark):
    rows = [("m1", "p"), ("m1", "q"), ("m2", "p"), ("m2", "q")]
    got = _collect(mirror_host_pairs(_corpus(spark, rows), "host", "text"))
    assert got == {("m1", "m2"): (2, 2, 2, 1000)}


def test_mirror_max_hosts_per_hash_prunes_boilerplate(spark):
    """Content on > max hosts is excluded from n_common but NOT from the
    set sizes — the one-sided df-prune semantics."""
    rows = [(f"h{i}", "boiler") for i in range(5)] + [
        ("h0", "real"),
        ("h1", "real"),
    ]
    got = _collect(
        mirror_host_pairs(
            _corpus(spark, rows), "host", "text", max_hosts_per_hash=3
        )
    )
    assert got == _py_pairs(rows, max_hosts_per_hash=3)
    # only (h0,h1) survives, with full sizes 2 and 2 in the denominator
    assert got == {("h0", "h1"): (2, 2, 1, 333)}


def test_mirror_min_permille_filter(spark):
    rows = [
        ("a", "x"), ("a", "y"), ("a", "z"), ("a", "w"),
        ("b", "x"),
        ("c", "x"), ("c", "y"), ("c", "z"), ("c", "w"),
    ]
    got = _collect(
        mirror_host_pairs(
            _corpus(spark, rows), "host", "text", min_permille=600
        )
    )
    assert got == _py_pairs(rows, min_permille=600)
    assert set(got) == {("a", "c")}


def test_host_content_sets_distinct(spark):
    rows = [("a", "x"), ("a", "x"), ("a", "y")]
    assert host_content_sets(_corpus(spark, rows), "host", "text").count() == 2


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_typosquat_pairs_match_python_blocked_oracle(spark):
    from eget_spark.operators.mirrors import typosquat_pairs

    doms = [
        "example.com", "exampel.com", "exmaple.com", "example.co",
        "shop.net", "shoop.net", "shap.net", "zhop.net",  # z-: other block
        "aaa.org", "aab.org", "abb.org",
    ]
    df = spark.createDataFrame([(d,) for d in doms], "domain string")
    got = sorted(
        (r.domain_a, r.domain_b, r.dist)
        for r in typosquat_pairs(df).collect()
    )
    want = sorted(
        (min(a, b), max(a, b), _lev(a, b))
        for i, a in enumerate(doms)
        for b in doms[i + 1 :]
        if a[:2] == b[:2] and abs(len(a) - len(b)) <= 1 and _lev(a, b) <= 1
    )
    assert got == want and len(got) > 0
    pairs = {(a, b) for a, b, _ in got}
    # dist-1 insertion and substitution found; dist-2 excluded
    assert ("shoop.net", "shop.net") in pairs or ("shop.net", "shoop.net") in pairs
    assert ("shap.net", "shop.net") in pairs
    assert not any("exmaple.com" in p and "exampel.com" in p for p in pairs)
    # documented blind spot: first-character typo is outside the block
    assert not any("zhop.net" in p for p in pairs)


def test_typosquat_dedups_and_orders_canonically(spark):
    from eget_spark.operators.mirrors import typosquat_pairs

    df = spark.createDataFrame(
        [("abc.com",), ("abc.com",), ("abd.com",)], "domain string"
    )
    rows = typosquat_pairs(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.domain_a, r.domain_b, r.dist) == ("abc.com", "abd.com", 1)
