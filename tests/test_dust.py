"""DUST param-strip rule mining vs a pure-Python oracle."""

from __future__ import annotations

from eget_spark.operators.dust import dust_param_rules


def _py_rules(rows, min_support=2):
    corpus = dict(set(rows))  # url -> ck (urls unique by construction)
    agg: dict[str, list[int]] = {}
    for url, ck in set(rows):
        base = url.split("#")[0]
        path, _, query = base.partition("?")
        params = [p for p in query.split("&") if p]
        for key in dict.fromkeys(p.split("=", 1)[0] for p in params):
            remaining = [p for p in params if p.split("=", 1)[0] != key]
            stripped = path + ("?" + "&".join(remaining) if remaining else "")
            a = agg.setdefault(key, [0, 0, 0, 0])
            a[0] += 1
            if stripped not in corpus:
                a[3] += 1
            elif corpus[stripped] == ck:
                a[1] += 1
            else:
                a[2] += 1
    return {
        k: (c, s, v, m, v == 0 and s >= min_support)
        for k, (c, s, v, m) in agg.items()
    }


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, content_key long")


def test_dust_valid_and_violated_rules(spark):
    rows = (
        [(f"https://a.test/p{i}", i) for i in range(6)]
        + [(f"https://a.test/p{i}?sid={i}77", i) for i in range(6)]      # sid irrelevant
        + [(f"https://a.test/p{i}?page=2", 100 + i) for i in range(4)]   # page changes content
        + [("https://a.test/p0?track=x", 0)]                             # 1 support only
        + [("https://a.test/p9?orphan=1", 9)]                            # stripped missing
    )
    got = {
        r["param_key"]: (
            r["n_candidates"], r["n_support"], r["n_violate"],
            r["n_missing"], r["valid"],
        )
        for r in dust_param_rules(_df(spark, rows), min_support=2).collect()
    }
    assert got == _py_rules(rows)
    assert got["sid"][4] is True
    assert got["page"][4] is False and got["page"][2] == 4
    assert got["track"] == (1, 1, 0, 0, False)   # support below min_support
    assert got["orphan"] == (1, 0, 0, 1, False)  # stripped URL absent


def test_dust_multi_param_strip_keeps_order(spark):
    # stripping sid from ?page=2&sid=9 must look up ?page=2 (order kept)
    rows = [
        ("https://a.test/x?page=2&sid=9", 5),
        ("https://a.test/x?page=2", 5),
        ("https://a.test/x", 1),
    ]
    got = {
        r["param_key"]: (r["n_support"], r["n_violate"])
        for r in dust_param_rules(_df(spark, rows), min_support=1).collect()
    }
    # sid: supported once (?page=2 same ck).  page: two candidates —
    # from ?page=2&sid=9 -> ?sid=9 missing; from ?page=2 -> base, ck differs
    assert got["sid"] == (1, 0)
    assert got["page"] == (0, 1)


def test_dust_fragment_and_flag_params(spark):
    rows = [
        ("https://a.test/y?flag#frag", 3),
        ("https://a.test/y", 3),
    ]
    got = {
        r["param_key"]: (r["n_support"], r["valid"])
        for r in dust_param_rules(_df(spark, rows), min_support=1).collect()
    }
    assert got == {"flag": (1, True)}


def test_dust_conflicting_content_keys_compact_to_min(spark):
    # a URL refetched with drifted content must compact to ONE row
    # (min ck) so the lookup join never fans out; with ck=1 winning,
    # the sid rule keeps exactly one candidate and one support
    rows = [
        ("https://a.test/x", 1),
        ("https://a.test/x", 2),          # drifted refetch, loses to min
        ("https://a.test/x?sid=7", 1),
    ]
    got = {
        r["param_key"]: (
            r["n_candidates"], r["n_support"], r["n_violate"], r["valid"]
        )
        for r in dust_param_rules(_df(spark, rows), min_support=1).collect()
    }
    assert got == {"sid": (1, 1, 0, True)}
