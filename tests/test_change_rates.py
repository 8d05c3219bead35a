"""Change-rate recrawl scheduling (operators/recrawl.py)."""

from __future__ import annotations

import datetime as dt

from eget_spark.operators.recrawl import US_PER_DAY, change_rates, recrawl_priority

T0 = dt.datetime(2024, 1, 1)


def _log(spark, rows):
    return spark.createDataFrame(
        [(pid, T0 + dt.timedelta(hours=h), fp, i) for i, (pid, h, fp) in enumerate(rows)],
        "page_id string, ts timestamp_ntz, fingerprint string, fetch_id long",
    )


def test_counts_fingerprint_transitions(spark):
    log = _log(
        spark,
        [
            ("a", 0, "x"), ("a", 12, "x"), ("a", 24, "y"), ("a", 48, "y"),
            ("b", 0, "x"), ("b", 24, "y"), ("b", 48, "x"),
            ("c", 0, "x"),
        ],
    )
    rows = {
        r["id"]: r
        for r in change_rates(log, "page_id", "ts", "fingerprint", "fetch_id").collect()
    }
    assert (rows["a"]["n_fetches"], rows["a"]["n_changes"]) == (4, 1)
    assert (rows["b"]["n_fetches"], rows["b"]["n_changes"]) == (3, 2)
    # a: 1 change over 2 days; b: 2 changes over 2 days
    assert rows["a"]["rate_per_day"] == 0.5
    assert rows["b"]["rate_per_day"] == 1.0
    # single observation: no span, no rate
    assert rows["c"]["span_us"] == 0 and rows["c"]["rate_per_day"] is None


def test_priority_rate_desc_nulls_last(spark):
    log = _log(
        spark,
        [
            ("a", 0, "x"), ("a", 24, "y"),   # 1 change / day
            ("b", 0, "x"), ("b", 24, "x"),   # 0 changes
            ("c", 0, "x"),                    # unknown
        ],
    )
    pri = {
        r["id"]: r["priority"]
        for r in recrawl_priority(
            change_rates(log, "page_id", "ts", "fingerprint", "fetch_id")
        ).collect()
    }
    assert pri == {"a": 1, "b": 2, "c": 3}


def test_tiebreak_pins_order_at_equal_timestamps(spark):
    # two fetches at the same instant: fetch_id orders them x -> y (1 change)
    log = _log(spark, [("a", 0, "x"), ("a", 0, "y")])
    r = change_rates(log, "page_id", "ts", "fingerprint", "fetch_id").collect()[0]
    assert r["n_changes"] == 1 and r["span_us"] == 0
    assert r["rate_per_day"] is None


def test_rate_uses_microsecond_span(spark):
    log = _log(spark, [("a", 0, "x"), ("a", 6, "y")])  # 6h span, 1 change
    r = change_rates(log, "page_id", "ts", "fingerprint", "fetch_id").collect()[0]
    assert r["span_us"] == 6 * 3600 * 10**6
    assert r["rate_per_day"] == round(US_PER_DAY / r["span_us"], 6) == 4.0


def test_window_and_agg_share_one_exchange(spark):
    log = _log(spark, [("a", 0, "x"), ("a", 12, "y"), ("b", 0, "x")]).repartition(4)
    plan = (
        change_rates(log, "page_id", "ts", "fingerprint", "fetch_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the lag window's hashpartitioning(id) satisfies the groupBy(id)
    # distribution: exactly one exchange on the log
    assert plan.count("Exchange hashpartitioning") == 1


# --- Cho & Garcia-Molina improved estimator ---------------------------------


def test_estimate_change_rate_matches_closed_form(spark):
    import math

    from eget_spark.operators.recrawl import estimate_change_rate

    checks = spark.createDataFrame(
        [("a", True), ("a", False), ("a", True), ("a", False),
         ("b", False), ("b", False), ("b", False),
         ("c", True), ("c", True)],
        "url string, changed boolean",
    )
    rows = {r["id"]: r for r in estimate_change_rate(checks).collect()}
    # a: n=4, X=2 -> r = -ln(2.5/4.5)
    r_a = -math.log(2.5 / 4.5)
    assert rows["a"]["rate_per_day"] == round(r_a, 6)
    assert rows["a"]["next_interval_sec"] == round(86400.0 / r_a)
    # b: never changed -> rate 0, max backoff
    assert rows["b"]["rate_per_day"] == 0.0
    assert rows["b"]["next_interval_sec"] == 604800
    # c: changed EVERY check (X == n) stays finite thanks to the +0.5
    # correction: r = -ln(0.5/2.5); interval clamps to the 1 h floor
    r_c = -math.log(0.5 / 2.5)
    assert rows["c"]["rate_per_day"] == round(r_c, 6)
    assert rows["c"]["next_interval_sec"] == max(3600, round(86400.0 / r_c))


def test_estimate_change_rate_clamps_to_floor(spark):
    from eget_spark.operators.recrawl import estimate_change_rate

    # 30 changes in 30 checks at a 60 s cadence: raw interval 60/r << 1 h
    checks = spark.createDataFrame(
        [("hot", True)] * 30, "url string, changed boolean"
    )
    row = estimate_change_rate(checks, interval_sec=60.0).collect()[0]
    assert row["next_interval_sec"] == 3600


def _py_exhaustion(rows, scale=10**6):
    from collections import Counter

    cnt = Counter(rows)
    hosts: dict[str, list[int]] = {}
    for (h, _u), c in cnt.items():
        hosts.setdefault(h, []).append(c)
    out = {}
    for h, cs in hosts.items():
        n_obs = sum(cs)
        n1 = sum(1 for c in cs if c == 1)
        out[h] = (n_obs, len(cs), n1, (n1 * scale) // n_obs)
    return out


def test_frontier_exhaustion_matches_python_oracle(spark):
    from eget_spark.operators.recrawl import frontier_exhaustion

    rows = []
    for i in range(200):
        rows.append((f"h{i % 4}", f"u{(i * i) % 37}"))  # quadratic pileup
    rows += [("fresh", f"u{i}") for i in range(30)]  # every URL a singleton
    df = spark.createDataFrame(rows, "host string, url string")
    got = {
        r["host"]: (r["n_obs"], r["n_urls"], r["n_singletons"], r["p_new_ppm"])
        for r in frontier_exhaustion(df).collect()
    }
    assert got == _py_exhaustion(rows)


def test_frontier_exhaustion_extremes(spark):
    """All-singletons host -> p_new = 1e6 (keep crawling); all-repeats
    host -> p_new = 0 (exhausted)."""
    from eget_spark.operators.recrawl import frontier_exhaustion

    rows = [("new", f"u{i}") for i in range(10)]
    rows += [("done", f"u{i % 3}") for i in range(12)]  # every URL seen 4x
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r["host"]: r["p_new_ppm"] for r in frontier_exhaustion(df).collect()}
    assert got == {"new": 10**6, "done": 0}


def _py_policy_freshness(lams_ppm, budget_ppm):
    import math

    n = len(lams_ppm)
    sum_lam = sum(lams_ppm)

    def fresh(lam, li):
        if lam == 0:
            return 1_000_000
        return round(1e6 * (1.0 - math.exp(-li)) / li)

    su = sum(fresh(l, l * n / budget_ppm) for l in lams_ppm)
    sp = sum(fresh(l, sum_lam / budget_ppm) for l in lams_ppm)
    return su // n, sp // n


def test_refresh_policy_matches_python_closed_form(spark):
    from eget_spark.operators.recrawl import refresh_policy_freshness

    lams = [0, 100_000, 500_000, 1_000_000, 4_000_000, 10_000_000]
    budget = 6 * 1_000_000  # one check/page/day on average
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lams)], "id long, rate_ppm long"
    )
    rows = {
        r["policy"]: r
        for r in refresh_policy_freshness(df, budget).collect()
    }
    want_u, want_p = _py_policy_freshness(lams, budget)
    assert rows["uniform"]["mean_fresh_ppm"] == want_u
    assert rows["proportional"]["mean_fresh_ppm"] == want_p
    assert rows["uniform"]["n_pages"] == 6
    # Cho & Garcia-Molina TODS 2003: uniform beats proportional for any
    # non-degenerate rate mix
    assert want_u > want_p


def test_refresh_policy_degenerate_equal_rates_tie(spark):
    from eget_spark.operators.recrawl import refresh_policy_freshness

    # identical rates: uniform == proportional (same lambda*I per page)
    df = spark.createDataFrame(
        [(i, 2_000_000) for i in range(4)], "id long, rate_ppm long"
    )
    rows = {
        r["policy"]: r["mean_fresh_ppm"]
        for r in refresh_policy_freshness(df, 8_000_000).collect()
    }
    assert rows["uniform"] == rows["proportional"]
