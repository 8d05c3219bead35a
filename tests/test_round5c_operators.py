"""Property tests for the q150-q155 batch (classifier, SURT, param
relevance, fairness Gini, scalar quantization): seeded random cases
against independent pure-Python references, batched into a handful of
Spark jobs (the test_normalize_property.py discipline)."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F


# --- linear classifier -----------------------------------------------------


def test_linear_scores_random_cases(spark):
    from eget_spark.operators.classifier import linear_text_scores

    rng = random.Random(51)
    vocab = {"alpha": 3, "beta": -2, "gamma": 7, "x9": -5}
    words = list(vocab) + ["delta", "epsilon", "zz", ""]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 12))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["n_hits"], r["score_fp"], r["kept"])
        for r in linear_text_scores(
            df, "id", "text", vocab, bias_fp=1, threshold_fp=2
        ).collect()
    }
    for i, text in rows:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        hits = [t for t in toks if t in vocab]
        score = 1 + sum(vocab[t] for t in hits)
        assert got[i] == (len(hits), score, score >= 2), (i, text)


def test_linear_scores_empty_and_punct(spark):
    from eget_spark.operators.classifier import linear_text_scores

    df = spark.createDataFrame(
        [(0, ""), (1, "ALPHA, beta!"), (2, "...")],
        "id long, text string",
    )
    got = {
        r["id"]: (r["n_hits"], r["score_fp"])
        for r in linear_text_scores(
            df, "id", "text", {"alpha": 10, "beta": -4}, bias_fp=-1
        ).collect()
    }
    assert got == {0: (0, -1), 1: (2, 5), 2: (0, -1)}


# --- SURT keys ---------------------------------------------------------------


def test_surt_key_pinned_cases(spark):
    from eget_spark.functions.urls import surt_key

    cases = [
        ("https://www.Example.org/A/b?z=1&a=2#f", "org,example)/a/b?a=2&z=1"),
        ("http://sub.host.co.uk/", "uk,co,host,sub)/"),
        ("https://example.com", "com,example)/"),
        ("https://example.com/p?", "com,example)/p"),
        ("https://WWW.UPPER.COM/Path/Q", "com,upper)/path/q"),
        ("https://a.b/x?b=2&b=1&a=3", "b,a)/x?a=3&b=1&b=2"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["surt"]
        for r in df.select("i", surt_key(F.col("url")).alias("surt")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, cases[i]


# --- URL param relevance ------------------------------------------------------


def _py_param_relevance(rows):
    per: dict = {}
    for url, fp in rows:
        base = re.sub(r"[?#].*$", "", url)
        m = re.search(r"\?([^#]*)", url)
        params = [p for p in (m.group(1) if m else "").split("&") if p]
        for kv in params:
            name = kv.split("=", 1)[0]
            value = kv.split("=", 1)[1] if "=" in kv else ""
            others = "&".join(sorted(p for p in params if p != kv))
            per.setdefault((base, name, others), []).append((value, fp))
    agg: dict = {}
    for (base, name, others), vs in per.items():
        nv = len({v for v, _ in vs})
        nfp = len({f for _, f in vs})
        if nv >= 2:
            n_bases, n_irr = agg.get(name, (0, 0))
            agg[name] = (n_bases + 1, n_irr + (1 if nfp == 1 else 0))
    return {
        name: (nb, ni, (1000 * ni) // nb) for name, (nb, ni) in agg.items()
    }


def test_param_relevance_random_cases(spark):
    from eget_spark.operators.url_params import param_relevance

    rng = random.Random(52)
    for case in range(3):
        rows = []
        for i in range(rng.randint(5, 80)):
            base = f"https://t.test/{rng.randint(0, 4)}"
            parts = []
            if rng.random() < 0.9:
                parts.append(f"page={rng.randint(0, 2)}")
            if rng.random() < 0.8:
                parts.append(f"sess={rng.randint(0, 3)}")
            if rng.random() < 0.2:
                parts.append("flag")
            url = base + ("?" + "&".join(parts) if parts else "")
            page = next(
                (p.split("=")[1] for p in parts if p.startswith("page=")), ""
            )
            fp = f"{base}|{page}"
            rows.append((url, fp))
        df = spark.createDataFrame(rows, "url string, fp string")
        got = {
            r["name"]: (r["n_bases"], r["n_irrelevant"], r["irrelevant_permille"])
            for r in param_relevance(df, "url", "fp").collect()
        }
        assert got == _py_param_relevance(rows), case


# --- fairness gini --------------------------------------------------------------


def _py_gini(counts: list[int]) -> int:
    xs = sorted(counts)
    n, tot = len(xs), sum(xs)
    if tot == 0:
        return 0
    return (2 * sum(i * x for i, x in enumerate(xs, 1)) - (n + 1) * tot) * 1000 // (
        n * tot
    )


def test_fairness_gini_random_cases(spark):
    from eget_spark.operators.fairness import fairness_gini

    rng = random.Random(53)
    for case in range(3):
        hosts = [f"h{i}" for i in range(rng.randint(1, 25))]
        rows = [(rng.choice(hosts),) for _ in range(rng.randint(1, 300))]
        df = spark.createDataFrame(rows, "host string")
        [r] = fairness_gini(df, "host").collect()
        from collections import Counter

        counts = list(Counter(h for (h,) in rows).values())
        assert r["n_keys"] == len(counts)
        assert r["total"] == len(rows)
        assert r["gini_permille"] == _py_gini(counts), case


def test_fairness_gini_extremes(spark):
    from eget_spark.operators.fairness import fairness_gini

    # perfectly even -> 0
    even = spark.createDataFrame(
        [(f"h{i % 4}",) for i in range(40)], "host string"
    )
    [r] = fairness_gini(even, "host").collect()
    assert r["gini_permille"] == 0
    # all mass on one host among many singletons -> high concentration
    skew = spark.createDataFrame(
        [("big",)] * 96 + [(f"s{i}",) for i in range(4)], "host string"
    )
    [r2] = fairness_gini(skew, "host").collect()
    assert r2["n_keys"] == 5 and r2["total"] == 100
    assert r2["gini_permille"] == _py_gini([96, 1, 1, 1, 1])


# --- scalar quantization ----------------------------------------------------------


def _py_squant(vec: list[float]):
    vfp = [int((abs(x) * 1e6 + 0.5) // 1) * (1 if x >= 0 else -1) for x in vec]
    # replicate floor(x*1e6+0.5) exactly (floor, not round-half-even)
    import math

    vfp = [math.floor(x * 1e6 + 0.5) for x in vec]
    s = max((abs(v) for v in vfp), default=0)
    if s == 0:
        codes = [0] * len(vfp)
    else:
        codes = [
            (1 if v >= 0 else -1) * ((127 * abs(v)) // s) for v in vfp
        ]
    err = 0
    for v, c in zip(vfp, codes):
        r = (1 if c >= 0 else -1) * ((abs(c) * s) // 127)
        err += (v - r) * (v - r)
    return s, codes, err


def test_scalar_quantize_random_cases(spark):
    from eget_spark.operators.squant import scalar_quantize

    rng = random.Random(54)
    rows = []
    for i in range(60):
        d = rng.choice([1, 3, 8])
        rows.append((i, [rng.uniform(-2, 2) for _ in range(d)]))
    rows.append((1000, [0.0, 0.0]))
    df = spark.createDataFrame(rows, "id long, v array<float>")
    got = {
        r["id"]: (r["scale_fp"], list(r["codes"]), r["recon_err_fp2"])
        for r in scalar_quantize(df, "id", "v").collect()
    }
    import numpy as np

    for i, vec in rows:
        # the engine sees float32 values; replicate that cast
        vec32 = [float(np.float32(x)) for x in vec]
        s, codes, err = _py_squant(vec32)
        assert got[i] == (s, codes, err), (i, vec)
        assert all(-127 <= c <= 127 for c in codes)


def _py_diversity(keys):
    import math
    from collections import Counter

    c = Counter(keys)
    n_tot = sum(c.values())
    h = sum(
        int(round(-1e6 * (n / n_tot) * math.log(n / n_tot)))
        for n in c.values()
    )
    sn2 = sum(n * (n - 1) for n in c.values())
    return {
        "richness": len(c),
        "shannon_micro": h,
        "eff_sources": round(math.exp(h / 1e6), 6),
        "simpson_permicro": (sn2 * 1_000_000) // (n_tot * (n_tot - 1))
        if n_tot > 1
        else 0,
        "berger_parker_micro": (max(c.values()) * 1_000_000) // n_tot,
    }


def test_diversity_matches_python_replay(spark):
    from eget_spark.operators.fairness import diversity_indices

    keys = ["a"] * 10 + ["b"] * 5 + ["c"] * 3 + ["d"] * 1 + ["e"] * 1
    df = spark.createDataFrame([(k,) for k in keys], "src string")
    got = diversity_indices(df, "src").collect()[0].asDict()
    assert got == _py_diversity(keys)


def test_diversity_uniform_mix_extremes(spark):
    import math

    from eget_spark.operators.fairness import diversity_indices

    # 4 equal sources: H = ln 4, eff_sources ~ 4, Berger-Parker = 1/4
    df = spark.createDataFrame(
        [(str(i % 4),) for i in range(40)], "src string"
    )
    got = diversity_indices(df, "src").collect()[0]
    assert got["richness"] == 4
    assert abs(got["shannon_micro"] - round(1e6 * math.log(4))) <= 2
    assert abs(got["eff_sources"] - 4.0) < 1e-4
    assert got["berger_parker_micro"] == 250_000


def test_diversity_single_source_degenerate(spark):
    from eget_spark.operators.fairness import diversity_indices

    df = spark.createDataFrame([("x",)] * 7, "src string")
    got = diversity_indices(df, "src").collect()[0]
    assert got["richness"] == 1
    assert got["shannon_micro"] == 0
    assert got["eff_sources"] == 1.0
    assert got["simpson_permicro"] == 1_000_000
    assert got["berger_parker_micro"] == 1_000_000
