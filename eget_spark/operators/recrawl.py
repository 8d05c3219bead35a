"""Recrawl scheduling from observed change history.

An incremental crawler re-fetches each page on a cadence matched to how
often it actually changes (Cho & Garcia-Molina 2003, "Effective page
refresh policies for web crawlers" — the public foundation of freshness-
driven recrawl).  The reference exposes the raw ingredient — a 24 h cache
TTL per URL (/root/reference/services/cache/cache_service.py) — i.e. ONE
fixed recrawl interval for every page; this operator derives a PER-PAGE
interval from the fetch log instead.

Input: a fetch-history table (page id, fetch timestamp, content
fingerprint).  Per page, order fetches by time and count fingerprint
transitions; the change-rate MLE observed at sample points is

    rate = n_changes / span          (span = last fetch - first fetch)

reported per day.  Pages that changed more recently per unit time are
re-fetched first: priority rank = dense order on (rate desc, id).

Scale shape (100 TB of fetch logs): ONE shuffle — the lag window
partitions by page id, and the follow-up per-page aggregate groups on the
same key, so Catalyst reuses the exchange (the window's hash partitioning
satisfies the aggregate's distribution).  All arithmetic is integer
microseconds plus one exactly-rounded division — engine-identical, no
libm.  The rank window is a global sort of ONE row per page (the already-
aggregated table), not of the log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

US_PER_DAY = 86_400_000_000


def change_rates(
    fetches: DataFrame,
    id_col: str = "page_id",
    ts_col: str = "ts",
    fp_col: str = "fingerprint",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(id, n_fetches, n_changes, span_us, rate_per_day) per page.

    ``rate_per_day`` is NULL for pages with zero observed span (a single
    fetch, or all fetches at one instant) — no evidence either way.
    ``tiebreak_col`` pins the fetch order when timestamps can collide.
    """
    # timestampdiff handles TIMESTAMP and TIMESTAMP_NTZ alike and is
    # timezone-independent for NTZ — parity with DuckDB's epoch_us on
    # naive timestamps regardless of the session zone
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    order = [us.asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(id_col).orderBy(*order)
    # group on the UN-aliased window key so the aggregate's required
    # distribution is satisfied by the window's hashpartitioning — one
    # exchange total (aliasing first would break the reuse)
    seq = fetches.select(
        F.col(id_col),
        us.alias("_us"),
        (F.col(fp_col) != F.lag(fp_col).over(w)).cast("long").alias("_chg"),
    )
    agg = seq.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.coalesce(F.sum("_chg"), F.lit(0)).cast("long").alias("n_changes"),
        (F.max("_us") - F.min("_us")).cast("long").alias("span_us"),
    ).withColumnRenamed(id_col, "id")
    rate = F.round(F.col("n_changes") * float(US_PER_DAY) / F.col("span_us"), 6)
    return agg.withColumn(
        "rate_per_day", F.when(F.col("span_us") > 0, rate)
    )


def recrawl_priority(rates: DataFrame) -> DataFrame:
    """Append the fetch-first rank: highest change rate first, NULL-rate
    (single-observation) pages last, id as the deterministic tiebreak.

    (rate desc NULLS LAST, id asc) is rewritten as the ascending key
    (-rate with NULL -> +inf, id) and ranked by
    :func:`~eget_spark.operators.sequence.with_global_seq` — the exact
    global rank via range exchange + per-partition row_number + prefix
    offsets, never a single-partition window (there is one RANK ROW PER
    PAGE; at 10^10 pages a global window would serialize the lot)."""
    from .sequence import with_global_seq

    keyed = rates.withColumn(
        "_nk",
        F.when(F.col("rate_per_day").isNull(), F.lit(float("inf"))).otherwise(
            -F.col("rate_per_day")
        ),
    )
    res = with_global_seq(keyed, ["_nk", "id"], start=1, seq_col="priority")
    return res.df.withColumn("priority", F.col("priority").cast("int")).drop("_nk")


def estimate_change_rate(
    checks: DataFrame,
    id_col: str = "url",
    changed_col: str = "changed",
    interval_sec: float = 86400.0,
    min_interval_sec: int = 3600,
    max_interval_sec: int = 604800,
) -> DataFrame:
    """Cho & Garcia-Molina's improved change-frequency estimator plus the
    refresh interval it implies (public paper: "Estimating Frequency of
    Change", ACM TOIT 2003, §4.2).  :func:`change_rates` above is the
    naive ``X/T`` estimator; it is biased low because a crawler that
    checks every ``I`` seconds can observe AT MOST one change per check —
    multiple changes inside one interval collapse into one observation.
    The improved estimator inverts the Poisson no-change probability with
    a +0.5 bias correction that also keeps the degenerate ``X == n`` case
    finite:

        r_hat = -ln((n - X + 0.5) / (n + 0.5))     [changes per interval]

    where ``n`` = number of checks and ``X`` = checks that observed a
    change.  The recommended refresh interval is ``I / r_hat`` (check
    about once per expected change), clamped to
    ``[min_interval_sec, max_interval_sec]``; a page with no observed
    change ever (``X == 0``, ``r_hat == 0``) backs off to the max.

    Input: one row per (page, check) with a boolean ``changed_col``.
    Output: ``(id, n_obs, n_changed, rate_per_day, next_interval_sec)``
    — ``rate_per_day`` rounded to 6 decimals, ``next_interval_sec`` a
    whole-second BIGINT (round-half-up, engine-identical for positives).

    The reference's recrawl story is a single fixed 24 h TTL for every
    URL (/root/reference/services/cache/cache_service.py); this derives
    the per-page cadence a 10^10-URL incremental crawl actually needs.

    Scale shape: ONE map-side-combined groupBy on the page id (count +
    conditional count), then pure per-row arithmetic — no window, no
    join, no Python; at 100 TB of check logs the only exchange is the
    uniform id-hash aggregate."""
    agg = checks.groupBy(F.col(id_col).alias("id")).agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum(F.col(changed_col).cast("long")).cast("long").alias("n_changed"),
    )
    return change_rates_from_counts(
        agg, interval_sec, min_interval_sec, max_interval_sec
    )


def change_rates_from_counts(
    counts: DataFrame,
    interval_sec: float = 86400.0,
    min_interval_sec: int = 3600,
    max_interval_sec: int = 604800,
) -> DataFrame:
    """The per-row arithmetic half of :func:`estimate_change_rate`, over
    pre-aggregated ``(id, n_obs, n_changed)`` counters.  Split out so the
    streaming maintainer (streaming/changerate.py) — whose drained state
    IS these counters, summed over epochs — reuses the identical
    expression tree and its rates are bit-equal to the batch estimator
    over the union of the micro-batches."""
    n = F.col("n_obs").cast("double")
    x = F.col("n_changed").cast("double")
    r_hat = -F.log((n - x + 0.5) / (n + 0.5))
    per_day = r_hat * (86400.0 / float(interval_sec))
    next_iv = F.when(F.col("n_changed") == 0, F.lit(int(max_interval_sec))).otherwise(
        F.least(
            F.lit(float(max_interval_sec)),
            F.greatest(
                F.lit(float(min_interval_sec)),
                F.round(F.lit(float(interval_sec)) / r_hat, 0),
            ),
        ).cast("long")
    )
    return counts.select(
        "id",
        "n_obs",
        "n_changed",
        F.round(per_day, 6).alias("rate_per_day"),
        next_iv.cast("long").alias("next_interval_sec"),
    )


def revalidate(cached: DataFrame, live: DataFrame) -> DataFrame:
    """HTTP conditional-revalidation classification — the dataflow form
    of RFC 9110 §13.1 (If-None-Match / If-Modified-Since): given the
    cache's stored validators and the live server's current ones, decide
    per URL whether the cached copy is still fresh.  The reference's
    cache has only a fixed TTL (services/cache/cache_service.py); real
    recrawl fleets revalidate instead of refetching, cutting fetch bytes
    by the unchanged fraction of the web.

    Inputs: ``cached`` (url, etag?, last_modified?) and ``live``
    (url, etag?, last_modified?) — timestamps as int64 epoch micros.
    Pinned precedence per RFC 9110 (ETag strong-compares first;
    Last-Modified only consulted when either side lacks an ETag):

    - both ETags present:      equal -> not_modified, else modified
    - else both LM present:    live <= cached -> not_modified, else modified
    - cached row with no live row -> gone
    - live row with no usable validator pair -> refetch

    Output: (url, action) with action in
    {not_modified, modified, gone, refetch}.

    Scale shape: ONE equi-join on url (both sides hash-partition on the
    key; the cache side is the big one and never broadcasts), then a
    codegen'd CASE — no Python, no extra shuffle.
    """
    c = cached.select(
        F.col("url"),
        F.col("etag").alias("_ce"),
        F.col("last_modified").alias("_cl"),
    )
    v = live.select(
        F.col("url"),
        F.col("etag").alias("_le"),
        F.col("last_modified").alias("_ll"),
        F.lit(True).alias("_live"),
    )
    j = c.join(v, "url", "left")
    action = (
        F.when(F.col("_live").isNull(), F.lit("gone"))
        .when(
            F.col("_ce").isNotNull() & F.col("_le").isNotNull(),
            F.when(F.col("_ce") == F.col("_le"), F.lit("not_modified"))
            .otherwise(F.lit("modified")),
        )
        .when(
            F.col("_cl").isNotNull() & F.col("_ll").isNotNull(),
            F.when(F.col("_ll") <= F.col("_cl"), F.lit("not_modified"))
            .otherwise(F.lit("modified")),
        )
        .otherwise(F.lit("refetch"))
    )
    return j.select("url", action.alias("action"))


def site_size_estimate(
    sample_a: DataFrame,
    sample_b: DataFrame,
    key_col: str,
    id_col: str,
) -> DataFrame:
    """Lincoln-Petersen capture-recapture estimate of per-site page
    counts from two independent crawl samples — the crawl-planning
    question ("how big is this host, really?") answered *before*
    committing frontier budget to it.  Two partial crawls of the same
    host rarely see the same pages; the overlap rate estimates the
    unseen mass:

    ``n_hat = (n_a * n_b) div m`` where n_a/n_b are the per-key sample
    sizes (distinct ids) and m = |A ∩ B|.  Integer floor division —
    bit-exact; keys with m = 0 return NULL ``est_size`` (disjoint
    samples carry no size signal — the standard undefined case).

    Returns (key, n_a, n_b, n_common, est_size).

    Scale shape: each side compacts to DISTINCT (key, id) — map-side-
    combined; sizes are two tiny |keys|-row aggregates; the overlap is
    ONE inner join on the (key, id) pair key (unique per side, nothing
    replicates) followed by a map-side-combined count.  Everything
    downstream of the distincts is |keys|-sized.
    """
    a = sample_a.select(
        F.col(key_col).alias("key"), F.col(id_col).alias("id")
    ).distinct()
    b = sample_b.select(
        F.col(key_col).alias("key"), F.col(id_col).alias("id")
    ).distinct()
    na = a.groupBy("key").agg(F.count("*").cast("long").alias("n_a"))
    nb = b.groupBy("key").agg(F.count("*").cast("long").alias("n_b"))
    m = (
        a.join(b, ["key", "id"])
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        na.join(nb, "key", "outer")
        .join(m, "key", "left")
        .select(
            "key",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.when(
                F.coalesce(F.col("n_common"), F.lit(0)) > 0,
                F.expr("(n_a * n_b) div n_common"),
            ).cast("long").alias("est_size"),
        )
    )


def frontier_exhaustion(
    sightings: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    scale: int = 10**6,
) -> DataFrame:
    """Good-Turing frontier-exhaustion estimate per host: from the crawl's
    URL-sighting log (one row per time a link to ``url`` was harvested —
    multiplicity is the signal), the probability that the NEXT harvested
    link on this host points somewhere never seen before is the classic
    missing-mass estimator

        p_new ~= N1 / N      (Good 1953; Gale & Sampson 1995 form)

    with N1 = URLs sighted exactly once and N = total sightings.  This is
    the per-host "is discovery saturating?" dial: a host whose links
    keep hitting fresh URLs (p_new high) deserves continued frontier
    budget, one whose sightings pile onto known URLs (p_new -> 0) is
    nearly exhausted — the dynamic companion to the static
    capture-recapture :func:`site_size_estimate` (q144), which sizes the
    site while this scores the marginal value of crawling it further.

    Integer discipline: ``p_new_ppm = (N1 * scale) div N`` (nonnegative
    operands, truncation == floor on both engines) — bit-exact
    cross-engine; no float anywhere.

    Returns (host, n_obs, n_urls, n_singletons, p_new_ppm).

    Scale shape: TWO map-side-combined aggregations — (host, url) sighting
    counts collapse per task before the shuffle (a hot URL costs a
    combiner cell), then the per-host rollup reuses the same hash
    partitioning family; no window, no join, no Python."""
    per_url = sightings.groupBy(host_col, url_col).agg(
        F.count("*").cast("long").alias("_cnt")
    )
    return (
        per_url.groupBy(host_col)
        .agg(
            F.sum("_cnt").cast("long").alias("n_obs"),
            F.count("*").cast("long").alias("n_urls"),
            F.sum((F.col("_cnt") == 1).cast("long")).cast("long").alias(
                "n_singletons"
            ),
        )
        .select(
            host_col,
            "n_obs",
            "n_urls",
            "n_singletons",
            F.expr(f"(n_singletons * {int(scale)}) div n_obs")
            .cast("long")
            .alias("p_new_ppm"),
        )
    )


def refresh_policy_freshness(
    rates: DataFrame,
    budget_per_day_ppm: int,
    id_col: str = "id",
    rate_ppm_col: str = "rate_ppm",
) -> DataFrame:
    """Expected corpus freshness of the two classic refresh policies
    (Cho & Garcia-Molina, "Effective page refresh policies for web
    crawlers", ACM TODS 2003): given per-page Poisson change rates
    ``lambda_i`` and a total revisit budget ``B`` checks/day, compare

    - **uniform**: every page re-checked at ``f = B/N``;
    - **proportional**: ``f_i = B * lambda_i / sum(lambda)``.

    Under Poisson changes and evenly spaced revisits at interval
    ``I = 1/f``, time-averaged freshness is
    ``F(lambda, I) = (1 - e^(-lambda*I)) / (lambda*I)`` (lambda = 0 ->
    F = 1).  The paper's counterintuitive headline — uniform beats
    proportional for any non-degenerate rate mix — falls out of the
    comparison (pinned in tests); proportional gives every page the
    SAME ``lambda*I = sum(lambda)/B``, wasting budget on pages that
    change faster than any revisit cadence can track.

    Determinism contract: inputs are INTEGER ppm rates and an integer
    ppm budget; each page's freshness is quantized to int64 ppm
    (``round(1e6 * F)``) BEFORE the corpus sum (the q226 discipline —
    exp/division are fixed IEEE expressions over exact integers), and
    the corpus mean is the exact integer ``sum div N``.

    Scale shape: ONE map-side-combined aggregate over the rate table
    per policy plus a 1-row broadcast of (N, sum-lambda) — no window,
    no Python; the rate table is already per-page metadata (one row per
    URL, not per fetch).

    Returns two rows: (policy, n_pages, budget_per_day_ppm,
    mean_fresh_ppm), ordered by policy."""
    base = rates.select(
        F.col(id_col).alias("id"),
        F.col(rate_ppm_col).cast("long").alias("lam_ppm"),
    )
    tot = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("lam_ppm").cast("long").alias("sum_lam"),
    )
    joined = base.crossJoin(F.broadcast(tot))
    # lambda*I per policy, as exact-integer-derived doubles:
    #   uniform:      lam_i * N / B
    #   proportional: sum_lam / B   (constant — the paper's observation)
    li_uniform = (
        F.col("lam_ppm").cast("double")
        * F.col("n").cast("double")
        / F.lit(float(budget_per_day_ppm))
    )
    li_prop = F.col("sum_lam").cast("double") / F.lit(
        float(budget_per_day_ppm)
    )

    def fresh_ppm(li):
        return F.round(
            F.when(F.col("lam_ppm") == 0, F.lit(1e6)).otherwise(
                F.lit(1e6) * (F.lit(1.0) - F.exp(-li)) / li
            ),
            0,
        ).cast("long")

    per_page = joined.select(
        fresh_ppm(li_uniform).alias("fu"),
        fresh_ppm(li_prop).alias("fp"),
    )
    sums = per_page.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("fu").cast("long").alias("su"),
        F.sum("fp").cast("long").alias("sp"),
    )
    u = sums.select(
        F.lit("uniform").alias("policy"),
        F.col("n").alias("n_pages"),
        F.lit(budget_per_day_ppm).cast("long").alias("budget_per_day_ppm"),
        F.expr("su div n").cast("long").alias("mean_fresh_ppm"),
    )
    p = sums.select(
        F.lit("proportional").alias("policy"),
        F.col("n").alias("n_pages"),
        F.lit(budget_per_day_ppm).cast("long").alias("budget_per_day_ppm"),
        F.expr("sp div n").cast("long").alias("mean_fresh_ppm"),
    )
    return u.unionByName(p).orderBy("policy")
