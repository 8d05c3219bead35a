"""Spider-trap URL-template analytics vs a Python oracle."""

from __future__ import annotations

import re
from collections import Counter
from urllib.parse import urlparse


def _template(u: str) -> str:
    t = re.sub(r"[0-9a-fA-F]{8,}", "H", u)
    t = re.sub(r"\d+", "N", t)
    return re.sub(r"=([^&#/]*)", "=V", t)


def test_trap_scores_match_python_oracle(spark):
    from eget_spark.operators.traps import template_counts, trap_scores

    urls = (
        [f"https://trap.x/cal/{i}/day/{i % 12}" for i in range(50)]
        + ["https://ok.x/about", "https://ok.x/contact", "https://ok.x/p/1"]
        + [f"https://mixed.x/item?id={i}&ses=deadbeefcafe{i:04d}" for i in range(10)]
        + ["https://mixed.x/home"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")

    by_host: dict[str, Counter] = {}
    for u in urls:
        by_host.setdefault(urlparse(u).netloc, Counter())[_template(u)] += 1
    got_tc = {
        (r["host"], r["template"]): r["n_urls"]
        for r in template_counts(df).collect()
    }
    want_tc = {
        (h, t): n for h, c in by_host.items() for t, n in c.items()
    }
    assert got_tc == want_tc

    got = {r["host"]: r for r in trap_scores(df).collect()}
    assert got["trap.x"]["trap_score"] == 1.0
    assert got["trap.x"]["top_template"] == "https://trap.x/cal/N/day/N"
    assert got["trap.x"]["n_templates"] == 1 and got["trap.x"]["n_urls"] == 50
    assert got["ok.x"]["trap_score"] < 0.5
    # session hex collapses into one template; 10/11 of mixed.x's urls
    assert got["mixed.x"]["top_template"] == "https://mixed.x/item?id=V&ses=V"
    assert abs(got["mixed.x"]["trap_score"] - 10 / 11) < 1e-6

    plan = trap_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # pure column expressions


def test_path_cycle_flags_pinned_cases(spark):
    from eget_spark.operators.traps import path_cycle_flags

    cases = {
        "https://a.test/x/y/x/y/x": (5, 3, True),     # period-2 cycle
        "https://a.test/a/b/c": (3, 1, False),
        "https://a.test/": (0, 0, False),
        "https://a.test": (0, 0, False),              # no path at all
        "https://a.test/a/a?a=1#a": (2, 2, False),    # query/frag stripped
        "https://a.test/" + "/".join(f"s{i}" for i in range(13)): (13, 1, True),
        "https://a.test//a///b//": (2, 1, False),     # empty segs dropped
        "https://a.test/p/p/p": (3, 3, True),
        "HTTP://a.test/x/y/x/y/x": (5, 3, True),  # RFC 3986 upper scheme
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: (r["depth"], r["max_seg_repeat"], r["is_trap"])
        for r in path_cycle_flags(df).collect()
    }
    assert got == cases


def test_path_cycle_flags_python_oracle(spark):
    import re

    from eget_spark.operators.traps import path_cycle_flags

    urls = [
        f"https://h{i%5}.test/" + "/".join(
            f"s{(i * j) % 4}" for j in range(1, (i % 6) + 1)
        )
        for i in range(40)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: (r["depth"], r["max_seg_repeat"], r["is_trap"])
        for r in path_cycle_flags(df, max_repeat=2, max_depth=4).collect()
    }
    want = {}
    for u in set(urls):
        m = re.match(r"^[a-z][a-z0-9+.\-]*://[^/?#]+([^?#]*)", u)
        segs = [s for s in (m.group(1) if m else "").split("/") if s]
        rep = max((segs.count(s) for s in segs), default=0)
        want[u] = (len(segs), rep, rep > 2 or len(segs) > 4)
    assert got == want


def test_subdomain_farm_flags(spark):
    from eget_spark.operators.traps import subdomain_farm_flags

    rows = (
        [(f"u{i}.spam.example.com",) for i in range(30)]          # farm
        + [("www.big.co.uk",)] * 40 + [("shop.big.co.uk",)] * 20  # legit
        + [(f"s{i}.tiny.org",) for i in range(3)]                 # few hosts
    )
    df = spark.createDataFrame(rows, "host string")
    got = {
        r["domain"]: (r["n_hosts"], r["n_pages"], r["avg_pages_permille"], r["farm"])
        for r in subdomain_farm_flags(df, min_hosts=20).collect()
    }
    assert got["example.com"] == (30, 30, 1000, True)
    assert got["big.co.uk"] == (2, 60, 30000, False)
    # below min_hosts: never a farm even at 1 page/host
    assert got["tiny.org"] == (3, 3, 1000, False)


def test_subdomain_farm_respects_avg_threshold(spark):
    from eget_spark.operators.traps import subdomain_farm_flags

    # 25 hosts but 10 pages each -> avg 10000 permille, not a farm
    rows = [(f"u{i}.dense.example.com",) for i in range(25)] * 10
    df = spark.createDataFrame(rows, "host string")
    r = subdomain_farm_flags(df, min_hosts=20).first()
    assert r["n_hosts"] == 25 and r["farm"] is False
