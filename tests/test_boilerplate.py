"""Host-template boilerplate detection/removal vs a Python oracle."""

from __future__ import annotations

import math


def _templates(docs, frac, min_pages, max_templates):
    from collections import Counter, defaultdict

    pages = Counter(h for h, _, _ in docs)
    per = defaultdict(set)  # (host, line) -> set of ids
    for h, i, text in docs:
        for line in set(text.split("\n")):
            if line.strip(" ") != "":
                per[(h, line)].add(i)
    out = defaultdict(list)
    for (h, line), ids in per.items():
        if pages[h] >= min_pages and len(ids) >= math.ceil(frac * pages[h]):
            out[h].append((len(ids), line))
    final = {}
    for h, cands in out.items():
        cands.sort(key=lambda t: (-t[0], t[1]))
        final[h] = {line for _, line in cands[:max_templates]}
    return final


def _strip(docs, tmpl):
    out = {}
    for h, i, text in docs:
        kept = [
            ln
            for ln in text.split("\n")
            if ln.strip(" ") == "" or ln not in tmpl.get(h, set())
        ]
        total = len(text.split("\n"))
        out[i] = (h, "\n".join(kept), len(kept), total - len(kept))
    return out


DOCS = [
    ("a.com", 1, "NAV\npage one body\nFOOT"),
    ("a.com", 2, "NAV\npage two body\nFOOT"),
    ("a.com", 3, "NAV\n\npage three body\nFOOT"),
    ("a.com", 4, "NAV\nrare promo\nFOOT"),
    ("a.com", 5, "NAV\npage five body\nFOOT\nrare promo"),
    # b.com reuses a.com's NAV text but has too few pages (< min_pages)
    ("b.com", 6, "NAV\nb six\nFOOT"),
    ("b.com", 7, "NAV\nb seven\nFOOT"),
    # c.com: 5 pages, CONSENT on 3/5 (>= ceil(0.5*5)=3 -> template)
    ("c.com", 8, "CONSENT\nc eight"),
    ("c.com", 9, "CONSENT\nc nine"),
    ("c.com", 10, "CONSENT\nc ten"),
    ("c.com", 11, "c eleven"),
    ("c.com", 12, "c twelve\nc twelve"),
]


def test_host_templates_matches_python_oracle(spark):
    from eget_spark.operators.boilerplate import host_templates

    df = spark.createDataFrame(
        DOCS, "host string, doc_id long, text string"
    ).repartition(4)
    got = host_templates(df, frac=0.5, min_pages=5, max_templates=50).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], set()).add(r["line"])
    assert by_host == {
        k: v for k, v in _templates(DOCS, 0.5, 5, 50).items() if v
    }
    # b.com is below min_pages: no templates even though NAV is on 100%
    assert "b.com" not in by_host
    # intra-page repeats count once: 'c twelve' has n_pages 1, not 2
    assert all(r["line"] != "c twelve" for r in got)


def test_strip_templates_matches_python_oracle(spark):
    from eget_spark.operators.boilerplate import strip_templates

    df = spark.createDataFrame(
        DOCS, "host string, doc_id long, text string"
    ).repartition(4)
    got = {
        r["id"]: (r["host"], r["text"], r["n_lines"], r["n_dropped"])
        for r in strip_templates(df, frac=0.5, min_pages=5, max_templates=50).collect()
    }
    tmpl = _templates(DOCS, 0.5, 5, 50)
    assert got == _strip(DOCS, tmpl)
    # blank line in doc 3 survives; NAV/FOOT dropped everywhere on a.com
    assert got[3][1] == "\npage three body"
    # every occurrence drops (not keep-first): doc 1 loses both NAV and FOOT
    assert got[1][3] == 2


def test_max_templates_cap_is_deterministic(spark):
    from eget_spark.operators.boilerplate import host_templates

    # 4 template lines, cap 2: highest n_pages wins, ties break line-asc
    docs = [
        ("h", i, "t_all\nz_all\na_most\nbody %d" % i) for i in range(1, 5)
    ] + [("h", 5, "t_all\nz_all\nbody 5")]
    df = spark.createDataFrame(docs, "host string, doc_id long, text string")
    got = host_templates(df, frac=0.5, min_pages=5, max_templates=2).collect()
    assert sorted((r["line"], r["n_pages"]) for r in got) == [
        ("t_all", 5), ("z_all", 5)
    ]


def test_strip_plan_broadcasts_templates(spark):
    from eget_spark.operators.boilerplate import strip_templates

    df = spark.createDataFrame(DOCS, "host string, doc_id long, text string")
    plan = strip_templates(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # the corpus-side apply join
