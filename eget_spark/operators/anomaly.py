"""Per-key event-rate anomaly detection (z-score over time buckets).

Crawl operations watch per-host fetch/error rates for spikes (a trap
neighborhood, a misbehaving scheduler, a site going down).  This
operator scores each (key, bucket) count against the key's own mean
and population standard deviation over the densified bucket range —
the plain z-score rule every monitoring stack publishes.

Exact semantics (pinned so the DuckDB oracle reproduces them):

- the bucket axis densifies per key over the GLOBAL [min, max] bucket
  range (integer bucket ids; missing buckets count 0) — without
  densification a key active in one bucket has zero variance and every
  quiet period is invisible;
- mean = sum/nb and population variance = (nb*sum(c^2) - sum(c)^2)/nb^2
  are computed from exact integer sums, so the only float ops are one
  division each plus one sqrt — correctly-rounded IEEE, identical
  across engines (the engine-wide cross-float recipe; avoids
  ``var_pop`` whose internal accumulation order is engine-specific);
- z = (c - mean)/sd; buckets with sd = 0 are never anomalous;
- output: (key, bucket, cnt, z) where |z| >= threshold.

Scale shape (the 100 TB story): one map-side-combined groupBy
(key, bucket) collapses raw events to at most keys x buckets rows;
per-key stats aggregate those (bucket-range-bounded per key — uniform,
no hot key possible because every key holds exactly the same densified
bucket count); the stats join back on key is uniform for the same
reason.  The densify explode generates keys x buckets rows from the
distinct-keys table, never from raw events.  No window over the whole
series, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rate_anomalies(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """(key, bucket, cnt, z) rows whose |z| >= threshold.

    ``bucket_col`` must already be an integer bucket id (e.g.
    ``floor(unix_timestamp(ts)/3600)`` for hourly buckets)."""
    ev = df.select(
        F.col(key_col).alias("key"), F.col(bucket_col).cast("long").alias("b")
    )
    counts = ev.groupBy("key", "b").agg(F.count(F.lit(1)).alias("cnt"))
    rng = ev.select(F.min("b").alias("lo"), F.max("b").alias("hi"))
    dense = (
        ev.select("key")
        .distinct()
        .crossJoin(F.broadcast(rng))  # one row — broadcast is exact-size
        .select("key", F.explode(F.sequence("lo", "hi")).alias("b"))
        .join(counts, ["key", "b"], "left")
        .select("key", "b", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )
    stats = dense.groupBy("key").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    scored = dense.join(stats, "key").select(
        "key",
        F.col("b").alias("bucket"),
        "cnt",
        (
            (
                F.col("cnt").cast("double")
                - F.col("s1").cast("double") / F.col("nb").cast("double")
            )
            / F.sqrt(
                (
                    (
                        F.col("nb") * F.col("s2") - F.col("s1") * F.col("s1")
                    ).cast("double")
                )
                / (F.col("nb") * F.col("nb")).cast("double")
            )
        ).alias("z"),
        (F.col("nb") * F.col("s2") - F.col("s1") * F.col("s1")).alias("_v"),
    )
    return (
        scored.where(
            (F.col("_v") > 0) & (F.abs(F.col("z")) >= F.lit(float(threshold)))
        )
        .select("key", "bucket", "cnt", "z")
    )


def ewma_rates(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    width_us: int = 3_600_000_000,
    alpha_num: int = 3,
    alpha_den: int = 10,
    scale: int = 10**6,
) -> DataFrame:
    """Exponentially-weighted moving-average event rate per key — the
    smoother behind adaptive crawl-rate control (a host whose recent
    fetch rate collapsed gets its politeness budget re-tightened; one
    hot hour shouldn't).  The classic server-side form (Heritrix-style
    adaptive revisit / TCP RTT estimation): fold
    ``e_t = alpha * x_t + (1 - alpha) * e_{t-1}`` over the DENSIFIED
    per-bucket counts (quiet buckets count 0, so the estimate decays
    through gaps — same densify discipline as :func:`rate_anomalies`).

    Pinned semantics (integer-only, engine-exact): counts are scaled to
    ``x * scale`` fixed point; alpha is the rational ``alpha_num /
    alpha_den``; the fold is ``e = (alpha_num * x + (alpha_den -
    alpha_num) * e_prev) div alpha_den`` left-to-right over buckets
    ascending, initialized with the FIRST bucket's scaled count.
    Returns (key, n_events, ewma_fp) with ewma_fp ~ rate * scale.

    Scale shape: one map-side-combined groupBy(key, bucket), then ONE
    groupBy(key) building the (bucket -> n) map; the densified series
    materializes per ROW as a JVM higher-order ``transform`` over
    ``sequence(lo, hi)`` and folds with ``aggregate`` — zero Python,
    zero window, no explode of quiet buckets.  The global (lo, hi)
    bucket range rides a 1-row broadcast.  Series length = time range /
    width (a monitoring window, thousands of buckets at most) — bounded
    per row regardless of corpus size.
    """
    from .rollup import time_bucket

    w = int(width_us)
    idx = (time_bucket(ts_col, w) / F.lit(w)).cast("long")
    counts = (
        events.select(F.col(key_col).alias("key"), idx.alias("b"))
        .groupBy("key", "b")
        .agg(F.count("*").cast("long").alias("n"))
    )
    rng = counts.agg(
        F.min("b").cast("long").alias("_lo"), F.max("b").cast("long").alias("_hi")
    )
    num, den, sc = int(alpha_num), int(alpha_den), int(scale)
    per_key = counts.groupBy("key").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("b", "n")))
        ).alias("_m"),
    )
    xs = (
        f"transform(sequence(_lo, _hi), bb -> "
        f"coalesce(element_at(_m, bb), 0L) * {sc})"
    )
    fold = (
        f"aggregate(slice({xs}, 2, size({xs}) - 1), ({xs})[0], "
        f"(a, x) -> ({num} * x + {den - num} * a) div {den})"
    )
    return (
        per_key.crossJoin(F.broadcast(rng))
        .select(
            "key",
            "n_events",
            F.expr(fold).cast("long").alias("ewma_fp"),
        )
    )


def burstiness_census(
    events: DataFrame,
    key_col: str = "host",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-key traffic-burstiness census over time-bucket counts: Fano
    factor (index of dispersion, Fano 1947), squared coefficient of
    variation, and the Goh-Barabási burstiness parameter
    ``B = (sigma - mu) / (sigma + mu)`` (Goh & Barabási, EPL 2008).

    A Poisson-looking host (Fano ~ 1, B ~ -1/sqrt(n)-ish) is a
    well-behaved fetch target; B -> 1 marks on/off burst traffic that a
    fixed crawl-delay models badly (q101's adaptive delays and q187's
    Poisson rate fits are the downstream consumers) — and sudden Fano
    jumps on a previously steady host are the dispersion twin of q254's
    mean-shift CUSUM.

    Pinned semantics: only OBSERVED buckets enter (a bucket with zero
    events is indistinguishable from the host being un-crawled then —
    the caller densifies if closed-world counts are wanted; pinned so
    both engines agree); per key with n buckets, S = sum counts, S2 =
    sum counts^2 — exact int64 — population variance identity
    ``var = (n*S2 - S^2) / n^2``:

    - fano = round((n*S2 - S^2) / (n*S in DOUBLE), 6)
    - cv2  = round((n*S2 - S^2) / (S^2 in DOUBLE), 6)
    - burstiness = round((sqrt(var) - mean) / (sqrt(var) + mean), 6)
      with var/mean the exact-ratio doubles; NULL when S == 0

    Scale shape (100 TB): one map-side-combined groupBy to (key,
    bucket) counts, one to per-key moments — post-combine tables are
    key-sized; no windows, no joins, no Python."""
    counts = events.groupBy(
        F.col(key_col).alias("key"), F.col(bucket_col).alias("b")
    ).agg(F.count("*").cast("long").alias("c"))
    mo = counts.groupBy("key").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    var_num = (F.col("n_buckets") * F.col("s2") - F.col("s") * F.col("s")
               ).cast("double")
    n_d = F.col("n_buckets").cast("double")
    s_d = F.col("s").cast("double")
    var = var_num / (n_d * n_d)
    mean = s_d / n_d
    sd = F.sqrt(var)
    return mo.select(
        "key",
        "n_buckets",
        F.col("s").alias("total"),
        F.when(F.col("s") > 0, F.round(var_num / (n_d * s_d), 6)).alias(
            "fano"
        ),
        F.when(F.col("s") > 0, F.round(var_num / (s_d * s_d), 6)).alias(
            "cv2"
        ),
        F.when(
            F.col("s") > 0, F.round((sd - mean) / (sd + mean), 6)
        ).alias("burstiness"),
    ).orderBy("key")
