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
