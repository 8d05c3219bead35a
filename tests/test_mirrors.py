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
