"""O3 politeness scheduler unit tests, including the hot-host salted path."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.operators.politeness import schedule_round
from eget_spark.schemas import FRONTIER_SCHEMA


def _frontier(spark, n, host="hot.example.com"):
    rows = [
        (f"https://{host}/p/{i:05d}", host, 1, None, i) for i in range(n)
    ]
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def _robots(spark, delay=1.0, host="hot.example.com"):
    return spark.createDataFrame(
        [(host, [], delay)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )


def test_exact_budget_lowest_seq_first(spark):
    frontier = _frontier(spark, 50)
    fetch, deferred = schedule_round(frontier, _robots(spark, 1.0), round_window=10.0)
    got = sorted(r["seq"] for r in fetch.collect())
    assert got == list(range(10))  # budget = 10/1.0, lowest seq first
    assert deferred.count() == 40


def test_no_delay_passthrough(spark):
    frontier = _frontier(spark, 20, host="free.example.com")
    fetch, deferred = schedule_round(frontier, _robots(spark, 1.0), round_window=10.0)
    assert fetch.count() == 20 and deferred.count() == 0


def test_salted_hot_host_budget_preserved(spark):
    """Above salt_threshold the host is salted; the per-salt budgets sum to
    >= the host budget (politeness approximate by design, never less work),
    and deferred rows keep their seq for FIFO carry-over."""
    frontier = _frontier(spark, 2000)
    fetch, deferred = schedule_round(
        frontier, _robots(spark, 0.1), round_window=10.0, salt_threshold=500
    )
    nf = fetch.count()
    # budget = 100, nsalt = ceil(2000/500) = 4, per-salt = 25 -> total <= 100
    # (hash imbalance can only reduce, never exceed, the per-salt sum)
    assert 0 < nf <= 100
    assert nf + deferred.count() == 2000
    # every deferred row keeps its original seq
    seqs = {r["seq"] for r in deferred.collect()}
    assert seqs.issubset(set(range(2000)))
    fetched_seqs = {r["seq"] for r in fetch.collect()}
    assert fetched_seqs.isdisjoint(seqs)


def test_politeness_many_hosts_column_side(spark):
    """2k distinct delayed hosts: counts/salting stay column-side (no driver
    dict — round-1 verdict fix #4) and every host's budget is respected."""
    import inspect

    from eget_spark.operators import politeness as pol_mod

    assert ".collect()" not in inspect.getsource(pol_mod)
    rows = [
        (f"h{i}.x", f"https://h{i}.x/p/{j}", 0, None, i * 10 + j)
        for i in range(2000)
        for j in range(3)
    ]
    frontier = spark.createDataFrame(
        rows, "host string, url string, depth int, parent_url string, seq long"
    )
    robots = spark.createDataFrame(
        [(f"h{i}.x", [], 1.0) for i in range(2000)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    fetch, deferred = schedule_round(frontier, robots, round_window=2.0)
    per_host = fetch.groupBy("host").count().collect()
    assert all(r["count"] <= 2 for r in per_host)
    assert fetch.count() + deferred.count() == len(rows)


def test_priority_ordering_wins_budget(spark):
    """Priority crawl: budget goes to high-priority URLs first (north-star
    per-host priority queue as the window order), FIFO as the tiebreak."""
    rows = [
        (f"https://hot.example.com/p/{i:03d}", "hot.example.com", 1, None, i, i % 3)
        for i in range(30)
    ]
    frontier = spark.createDataFrame(
        rows,
        "url string, host string, depth int, parent_url string, seq long, priority int",
    )
    fetch, deferred = schedule_round(
        frontier,
        _robots(spark, 1.0),
        round_window=10.0,
        order_cols=[F.desc("priority"), "seq"],
    )
    got = [(r["priority"], r["seq"]) for r in fetch.orderBy(F.desc("priority"), "seq").collect()]
    # budget 10 -> the ten priority-2 rows (seqs 2,5,...,29), FIFO within
    assert got == [(2, s) for s in range(2, 30, 3)]
    assert deferred.count() == 20


def test_host_circuit_breaker_integer_rule_edges(spark):
    from eget_spark.operators.politeness import host_circuit_breaker

    rows = (
        [("bad", False)] * 6 + [("bad", True)] * 4          # 60% fail, n=10
        + [("edge", False)] * 5 + [("edge", True)] * 5      # exactly 50%, n=10
        + [("young", False)] * 9                            # 100% fail, n=9
        + [("good", True)] * 12 + [("good", False)]         # ~8% fail
    )
    df = spark.createDataFrame(rows, "host string, ok boolean")
    got = {r["host"]: r for r in
           host_circuit_breaker(df, "host", "ok", 10, 50).collect()}
    assert got["bad"]["tripped"] is True
    # exactly at the budget is NOT tripped (strict >)
    assert got["edge"]["tripped"] is False
    # below min_attempts never trips, however bad the rate
    assert got["young"]["tripped"] is False and got["young"]["n_failures"] == 9
    assert got["good"]["tripped"] is False
    assert got["bad"]["n_attempts"] == 10 and got["bad"]["n_failures"] == 6


# --- largest-remainder budget apportionment ---------------------------------


def _py_apportion(weights: dict, b: int) -> dict:
    w_tot = sum(weights.values())
    if w_tot <= 0:
        return {k: 0 for k in weights}
    base = {k: (b * w) // w_tot for k, w in weights.items()}
    rem = {k: (b * w) % w_tot for k, w in weights.items()}
    left = b - sum(base.values())
    order = sorted(weights, key=lambda k: (-rem[k], k))
    out = dict(base)
    for k in order[:left]:
        out[k] += 1
    return out


def test_apportion_matches_python_oracle(spark):
    from eget_spark.operators.politeness import apportion_budget

    weights = {"a": 5, "b": 3, "c": 3, "d": 1, "e": 0}
    df = spark.createDataFrame(
        list(weights.items()), "host string, weight long"
    )
    got = {
        r["key"]: r["budget"]
        for r in apportion_budget(df, 100, "host", "weight").collect()
    }
    assert got == _py_apportion(weights, 100)
    assert sum(got.values()) == 100


def test_apportion_exact_total_and_ties(spark):
    """Three equal weights, budget not divisible by 3: ties break by key
    ascending, total is exact."""
    from eget_spark.operators.politeness import apportion_budget

    df = spark.createDataFrame(
        [("x", 7), ("y", 7), ("z", 7)], "host string, weight long"
    )
    got = {
        r["key"]: r["budget"]
        for r in apportion_budget(df, 10, "host", "weight").collect()
    }
    assert got == {"x": 4, "y": 3, "z": 3}


def test_apportion_zero_and_null_weights(spark):
    from eget_spark.operators.politeness import apportion_budget

    df = spark.createDataFrame(
        [("a", 10), ("b", None), ("c", 0)], "host string, weight long"
    )
    got = {
        r["key"]: r["budget"]
        for r in apportion_budget(df, 5, "host", "weight").collect()
    }
    assert got == {"a": 5, "b": 0, "c": 0}


def test_apportion_all_zero_weights(spark):
    """W == 0: bases are 0, the leftover still distributes (key asc) so
    the total stays exact."""
    from eget_spark.operators.politeness import apportion_budget

    df = spark.createDataFrame(
        [("a", 0), ("b", 0)], "host string, weight long"
    )
    got = {
        r["key"]: r["budget"]
        for r in apportion_budget(df, 3, "host", "weight").collect()
    }
    assert sum(got.values()) == 3


def test_fetch_timeline_matches_python(spark):
    from eget_spark.operators.politeness import fetch_timeline

    rows = [
        ("a", 10, 200), ("a", 3, 200), ("a", 7, 200),
        ("b", 1, 0), ("b", 2, 0),
        ("c", 5, 1000),
    ]
    df = spark.createDataFrame(rows, "host string, seq long, delay_ms long")
    got = {
        (r["host"], r["seq"]): (r["slot"], r["start_ms"], r["finish_ms"])
        for r in fetch_timeline(df, fetch_ms=50).collect()
    }
    want = {}
    by_host: dict[str, list] = {}
    for h, s, d in rows:
        by_host.setdefault(h, []).append((s, d))
    for h, lst in by_host.items():
        for k, (s, d) in enumerate(sorted(lst), start=1):
            start = (k - 1) * (50 + d)
            want[(h, s)] = (k, start, start + 50)
    assert got == want


def test_fetch_timeline_consistent_with_makespan_span(spark):
    # per-host max(finish) must equal the makespan bound's politeness span
    # n*fetch + (n-1)*delay
    import pyspark.sql.functions as F
    from eget_spark.operators.politeness import fetch_timeline, makespan_bound

    rows = [("a", i, 200) for i in range(7)] + [("b", i, 50) for i in range(30)]
    df = spark.createDataFrame(rows, "host string, seq long, delay_ms long")
    tl = (
        fetch_timeline(df, fetch_ms=50)
        .groupBy("host")
        .agg(F.max("finish_ms").alias("fin"), F.count("*").alias("n"),
             F.max("delay_ms").alias("d"))
        .collect()
    )
    for r in tl:
        assert r["fin"] == r["n"] * 50 + (r["n"] - 1) * r["d"]
    hosts = spark.createDataFrame(
        [("a", 7, 200), ("b", 30, 50)], "host string, n_pages long, delay_ms long"
    )
    mb = makespan_bound(hosts, fetch_ms=50, workers=2).first()
    assert mb["max_host_span_ms"] == max(r["fin"] for r in tl)


def test_implied_crawl_delay_matches_python(spark):
    from eget_spark.operators.politeness import implied_crawl_delay

    rows = []
    for h, delays in {"a": [100, 300, 100, 500], "b": [50], "c": []}.items():
        t = 0
        rows.append((h, t))
        for g in delays:
            t += g
            rows.append((h, t))
    df = spark.createDataFrame(rows, "host string, ts_ms long")
    got = {
        r["host"]: (r["n_gaps"], r["min_gap_ms"], r["median_gap_ms"])
        for r in implied_crawl_delay(df).collect()
    }
    # a: gaps sorted [100,100,300,500], median rank ceil(4/2)=2 -> 100
    assert got["a"] == (4, 100, 100)
    assert got["b"] == (1, 50, 50)
    assert "c" not in got  # single fetch: no gaps, no row


def test_implied_crawl_delay_odd_median(spark):
    from eget_spark.operators.politeness import implied_crawl_delay

    ts = [0, 100, 400, 600]  # gaps 100, 300, 200 -> sorted 100,200,300
    df = spark.createDataFrame([("x", t) for t in ts], "host string, ts_ms long")
    r = implied_crawl_delay(df).first()
    assert (r["n_gaps"], r["min_gap_ms"], r["median_gap_ms"]) == (3, 100, 200)
