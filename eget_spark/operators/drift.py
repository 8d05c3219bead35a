"""CUSUM drift detection over per-host metric series.

A crawl fleet watches per-host signals — fetch latency, error rate,
bytes/page — for sustained shifts: a host that got slow (throttling),
an error-rate step (ban), a page-size jump (template change, q82's
snapshot-diff complement at the metric level).  The classic sequential
detector is Page's CUSUM (Biometrika 1954):

    S_0 = 0;   S_n = max(0, S_{n-1} + (x_n - k))

with k the reference value (in-control mean plus slack); an alarm fires
when S_n >= h.  The recurrence looks inherently sequential, but it has
the textbook closed form (reflection at zero):

    S_n = cum_n - min(0, min_{j<=n} cum_j),   cum_j = sum_{i<=j}(x_i - k)

which is exactly two running windows — a cumulative sum and a running
minimum — so the whole detector is dataflow, no per-row recursion.

Pinned semantics (so the DuckDB oracle is bit-exact): values, k, and h
are int64; every S_n is an exact integer; rows order by ``ts`` within a
key and ``ts`` must be unique per key (the caller's contract — crawl
ledgers are per-(host, fetch-time) unique).  Output per key: point
count, the maximum CUSUM reached, the FIRST ts where the alarm
threshold was crossed (NULL if never), and the drift flag.

Scale shape (100 TB): ONE Window node computes both running frames over
the same (key ORDER BY ts) spec — a single hash shuffle on key; the
per-key summary groupBy reuses that partitioning (no second exchange).
State per key is O(1); skew equals the hottest host's ledger, which is
bounded by the politeness budget upstream.  No joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_drift(
    series: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = 0,
    h: int = 1,
) -> DataFrame:
    """(key, n, max_cusum, alarm_ts, drifted) per key — one-sided upward
    CUSUM with reference ``k`` and alarm threshold ``h``."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    adj = F.col(value_col).cast("long") - F.lit(int(k)).cast("long")
    # keep the ORIGINAL key/ts names through both window selects: an
    # alias between them breaks partitioning/ordering reuse and costs a
    # second (redundant) hash exchange on the full series
    cummed = series.select(
        F.col(key_col),
        F.col(ts_col),
        F.sum(adj).over(w).alias("cum"),
    )
    w2 = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = cummed.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        (
            F.col("cum")
            - F.least(F.min("cum").over(w2), F.lit(0).cast("long"))
        ).alias("s"),
    )
    return (
        stepped.groupBy("key")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max("s").cast("long").alias("max_cusum"),
            F.min(F.when(F.col("s") >= int(h), F.col("ts"))).alias(
                "alarm_ts"
            ),
        )
        .select(
            "key",
            "n",
            "max_cusum",
            "alarm_ts",
            (F.col("max_cusum") >= int(h)).alias("drifted"),
        )
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance (Kolmogorov 1933;
    Smirnov 1939): D = sup_v |F_a(v) - F_b(v)| between two cohorts'
    empirical distributions — the distribution-shape companion to
    CUSUM's mean shift (a latency distribution can keep its mean and
    still grow a second mode; KS sees it, CUSUM doesn't).

    Pinned semantics: evaluated at every distinct value (where ECDFs
    step); with cumulative counts c_a(v), c_b(v) and totals n_a, n_b,
    the integer deviation is ``dev(v) = |n_b*c_a(v) - n_a*c_b(v)|`` —
    exact int64 (envelope: n_a*n_b < 2^63) — and

        d = round(max dev / (n_a * n_b in DOUBLE), 6)

    ``at_value`` is the smallest value attaining the max (pinned).

    Scale shape (100 TB): per-value counts are one map-side-combined
    groupBy; the running cumulatives use the skyline/sequence prefix
    mechanism — range exchange on value, per-partition window cumsum,
    driver-bounded per-partition totals (one row per shuffle partition)
    broadcast back as prefix offsets.  NEVER a SinglePartition window.
    """
    spark = df.sparkSession
    vals = df.where(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(value_col).cast("long").alias("v"),
        (F.col(group_col) == group_a).cast("long").alias("is_a"),
    )
    per_v = vals.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("long").alias("cb"),
    )
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = (
        per_v.repartitionByRange(nparts, F.col("v"))
        .sortWithinPartitions("v")
        .withColumn("_pid", F.spark_partition_id().cast("long"))
        .persist()
    )
    psums = {
        r["_pid"]: (r["sa"], r["sb"])
        for r in parts.groupBy("_pid")
        .agg(F.sum("ca").alias("sa"), F.sum("cb").alias("sb"))
        .collect()
    }
    seeds = []
    acc_a = acc_b = 0
    for pid in sorted(psums):
        seeds.append((pid, acc_a, acc_b))
        acc_a += psums[pid][0]
        acc_b += psums[pid][1]
    n_a, n_b = acc_a, acc_b
    seed_df = spark.createDataFrame(
        seeds or [], "_pid long, _offa long, _offb long"
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = F.abs(
        F.lit(n_b).cast("long") * (F.col("_offa") + F.sum("ca").over(w_in))
        - F.lit(n_a).cast("long") * (F.col("_offb") + F.sum("cb").over(w_in))
    )
    stepped = parts.join(F.broadcast(seed_df), "_pid").select(
        "v", dev.cast("long").alias("dev")
    )
    top = stepped.agg(F.max("dev").cast("long").alias("d_num"))
    out = (
        stepped.crossJoin(F.broadcast(top))
        .where(F.col("dev") == F.col("d_num"))
        .agg(
            F.min("v").cast("long").alias("at_value"),
            F.max("d_num").cast("long").alias("d_num"),
        )
        .select(
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
            "d_num",
            F.when(
                F.lit(n_a > 0 and n_b > 0),
                F.round(
                    F.col("d_num").cast("double")
                    / (float(n_a) * float(n_b) if n_a and n_b else 1.0),
                    6,
                ),
            ).alias("d"),
            "at_value",
        )
        .localCheckpoint()
    )
    parts.unpersist()
    return out


def psi_buckets(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Population Stability Index between two cohorts' bucketed
    distributions (the standard model-monitoring drift score; the
    symmetrized-KL-on-buckets identity): per bucket

        term = (p_a - p_b) * ln(p_a / p_b)

    with Laplace add-one smoothing pinned on BOTH cohorts (zero buckets
    would make the log blow up; add-one keeps every bucket defined and
    bit-exact), each term micro-quantized BEFORE the sum (q249
    discipline); the conventional read: < 0.1 stable, > 0.25 shifted.

    Output one row per bucket (bucket, ca, cb, term_micro,
    psi_total_micro) ordered by bucket, total replicated.

    Scale shape: one map-side-combined groupBy to (bucket, group)
    counts, a bucket-spine left join (bucket space is small by
    construction — it's a histogram), totals on a 1-row broadcast."""
    vals = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(bucket_col).cast("long").alias("bucket"),
        (F.col(group_col) == group_a).cast("long").alias("is_a"),
    )
    per_b = vals.groupBy("bucket").agg(
        F.sum("is_a").cast("long").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("long").alias("cb"),
    )
    tot = per_b.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count("*").cast("long").alias("nbuckets"),
    )
    pa = (F.col("ca") + 1).cast("double") / (
        F.col("na") + F.col("nbuckets")
    ).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (
        F.col("nb") + F.col("nbuckets")
    ).cast("double")
    terms = per_b.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "ca",
        "cb",
        F.round((pa - pb) * F.log(pa / pb) * 1e6)
        .cast("long")
        .alias("term_micro"),
    )
    total = terms.agg(
        F.sum("term_micro").cast("long").alias("psi_total_micro")
    )
    return (
        terms.crossJoin(F.broadcast(total))
        .select("bucket", "ca", "cb", "term_micro", "psi_total_micro")
        .orderBy("bucket")
    )


def wilson_intervals(
    df: DataFrame,
    key_col: str = "host",
    success_col: str = "success",
    z_micro: int = 1_959_964,
) -> DataFrame:
    """Wilson score interval per key (Wilson, JASA 1927): the binomial
    confidence interval that behaves at small n and extreme rates —
    exactly the recrawl-scheduler's situation (a host fetched 7 times
    with 7 successes is NOT certainly healthy; Wilson's upper/lower
    bounds say how unsure).  The interval twin of q251's UCB bonus.

    Pinned semantics: z arrives as micro-units (default 1.959964 =
    95%); with exact int64 n and s, all arithmetic is ONE pinned double
    chain (z2 = z*z; denom = 1 + z2/n; center = (p + z2/2n)/denom;
    half = z*sqrt(p(1-p)/n + z2/4n^2)/denom), lo/hi round-6 and clamped
    to [0, 1] by construction.  Output (key, n, successes, p, lo, hi).

    Scale shape: ONE map-side-combined groupBy; scoring is a pure
    projection.  No windows, no joins, no Python."""
    z = z_micro / 1e6
    agg = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(success_col).cast("long")).cast("long").alias(
            "successes"
        ),
    )
    n = F.col("n").cast("double")
    p = F.col("successes").cast("double") / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = (
        F.lit(z)
        * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        / denom
    )
    return agg.select(
        "key",
        "n",
        "successes",
        F.round(p, 6).alias("p"),
        F.round(center - half, 6).alias("lo"),
        F.round(center + half, 6).alias("hi"),
    ).orderBy("key")


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between two
    cohorts (Monge 1781 / Kantorovich 1942; in 1-D it is the area
    between the ECDFs, Vallender 1974) — the magnitude-aware companion
    to q276's KS: KS reports the WORST ECDF gap, W1 integrates ALL of
    it, so a long mild drift (which KS underweights) and a short sharp
    one are told apart.

    Pinned semantics: with per-distinct-value counts and inclusive
    cumulatives, each value's contribution is the EXCLUSIVE deviation
    times the gap to the previous value,

        contrib(v) = |n_b*(C_a(v)-c_a(v)) - n_a*(C_b(v)-c_b(v))|
                     * (v - prev_v)

    (the left-Riemann sum of |F_a - F_b| — exact, not an
    approximation, because ECDFs are step functions); w1_num =
    sum(contrib) is exact int64 and

        w1 = round(w1_num / (n_a * n_b in DOUBLE), 6)

    in the units of ``value_col``.

    Scale shape (100 TB): cumulatives via with_global_prefix_sums
    (range exchange + per-partition windows + driver-bounded offsets);
    the previous-value gap is a per-partition lag whose boundary seeds
    ride the same ONE-row-per-partition broadcast.  Never a
    SinglePartition window."""
    from .sequence import with_global_prefix_sums

    spark = df.sparkSession
    vals = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).cast("long").alias("v"),
        (F.col(group_col) == group_a).cast("long").alias("is_a"),
    )
    per_v = vals.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("long").alias("cb"),
    )
    res = with_global_prefix_sums(per_v, ["v"], ["ca", "cb"])
    n_a, n_b = res.totals["ca"], res.totals["cb"]
    # boundary seeds for the per-partition lag: each partition's max v,
    # shifted to the NEXT partition (one row per partition, driver-
    # bounded — the same discipline as the prefix offsets)
    pmax = {
        r["_pid"]: r["m"]
        for r in res.df.groupBy("_pid").agg(F.max("v").alias("m")).collect()
    }
    seeds = []
    prev = None
    for pid in sorted(pmax):
        seeds.append((pid, prev))
        prev = pmax[pid]
    seed_df = spark.createDataFrame(seeds or [], "_pid long, _prevmax long")
    w = Window.partitionBy("_pid").orderBy("v")
    g = res.df.join(F.broadcast(seed_df), "_pid", "left")
    prev_v = F.coalesce(F.lag("v").over(w), F.col("_prevmax"), F.col("v"))
    dev_excl = F.abs(
        F.lit(n_b).cast("long") * (F.col("ca_cum") - F.col("ca"))
        - F.lit(n_a).cast("long") * (F.col("cb_cum") - F.col("cb"))
    )
    out = (
        g.select((dev_excl * (F.col("v") - prev_v)).alias("contrib"))
        .agg(F.coalesce(F.sum("contrib"), F.lit(0)).cast("long").alias(
            "w1_num"
        ))
        .select(
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
            "w1_num",
            F.round(
                F.col("w1_num").cast("double")
                / (float(n_a) * float(n_b) if n_a and n_b else 1.0),
                6,
            ).alias("w1"),
        )
        .localCheckpoint()
    )
    res.unpersist()
    return out


def best_thresholds(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Optimal decision thresholds for a binary scorer: the full
    threshold sweep (predict positive when score >= t, one candidate t
    per distinct score) reduced to the argmax rows under the two
    textbook criteria — max F1 (van Rijsbergen 1979) and max Youden's J
    = TPR - FPR (Youden, Cancer 1950).  The missing piece between
    q265's threshold-free AUC and q252's calibration: the number you
    actually set the q150 quality gate to.

    Pinned semantics: per-distinct-score counts, descending-order
    inclusive prefix sums give exact int64 tp/fp per candidate;
    precision/recall/tpr/fpr in exact ppm (truncating DIV);
    f1_ppm = (2*prec*rec) DIV (prec+rec); j_micro = tpr - fpr (signed);
    ties break to the HIGHER threshold (pinned — the stricter gate).
    Output two rows, one per criterion: (criterion, threshold, tp, fp,
    fn, tn, precision_ppm, recall_ppm, f1_ppm, j_micro).

    Scale shape: one map-side-combined groupBy to score groups, the
    with_global_prefix_sums mechanism for the sweep, and two mergeable
    TakeOrdered(1) selections.  Never a SinglePartition window."""
    from .sequence import with_global_prefix_sums

    base = scored.select(
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("long").alias("y"),
    )
    per_s = base.groupBy("s").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(1 - F.col("y")).cast("long").alias("neg"),
    ).withColumn("_negs", (-F.col("s")).cast("long"))
    res = with_global_prefix_sums(per_s, ["_negs"], ["pos", "neg"])
    p_tot, n_tot = res.totals["pos"], res.totals["neg"]
    sweep = res.df.select(
        F.col("s").alias("threshold"),
        F.col("pos_cum").alias("tp"),
        F.col("neg_cum").alias("fp"),
        (F.lit(p_tot).cast("long") - F.col("pos_cum")).alias("fn"),
        (F.lit(n_tot).cast("long") - F.col("neg_cum")).alias("tn"),
    ).withColumn(
        "precision_ppm",
        F.expr("tp * CAST(1000000 AS BIGINT) DIV (tp + fp)"),
    ).withColumn(
        "recall_ppm",
        F.expr(f"tp * CAST(1000000 AS BIGINT) DIV {max(p_tot, 1)}"),
    ).withColumn(
        "f1_ppm",
        F.when(
            F.col("precision_ppm") + F.col("recall_ppm") > 0,
            F.expr(
                "2 * precision_ppm * recall_ppm"
                " DIV (precision_ppm + recall_ppm)"
            ),
        ).otherwise(F.lit(0)).cast("long"),
    ).withColumn(
        "j_micro",
        (
            F.expr(f"tp * CAST(1000000 AS BIGINT) DIV {max(p_tot, 1)}")
            - F.expr(f"fp * CAST(1000000 AS BIGINT) DIV {max(n_tot, 1)}")
        ).cast("long"),
    )
    cols = ["threshold", "tp", "fp", "fn", "tn", "precision_ppm",
            "recall_ppm", "f1_ppm", "j_micro"]
    by_f1 = (
        sweep.orderBy(F.col("f1_ppm").desc(), F.col("threshold").desc())
        .limit(1)
        .select(F.lit("f1").alias("criterion"), *cols)
    )
    by_j = (
        sweep.orderBy(F.col("j_micro").desc(), F.col("threshold").desc())
        .limit(1)
        .select(F.lit("youden_j").alias("criterion"), *cols)
    )
    out = by_f1.unionAll(by_j).orderBy("criterion").localCheckpoint()
    res.unpersist()
    return out


def sprt_decisions(
    ledger: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts",
    success_col: str = "success",
    l_pos_micro: int = 336472,
    l_neg_micro: int = -510826,
    bound_micro: int = 2_944_439,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per key (Wald, Annals
    of Math. Stat. 1945) — decide BETWEEN two success rates with the
    fewest observations: the sequential sibling of q278's fixed-n
    Wilson bounds and q269's fixed-n McNemar, and exactly what a crawl
    health-checker wants ("stop probing this host as soon as the
    evidence is in").

    Pinned semantics: per observation the log-likelihood-ratio step is
    one of TWO pre-quantized micro constants (``l_pos_micro`` for a
    success = round(1e6*ln(p1/p0)), ``l_neg_micro`` for a failure =
    round(1e6*ln((1-p1)/(1-p0))); the defaults encode p0=0.5 vs p1=0.7)
    so the running LLR is an exact int64 cumulative sum in (key, ts)
    order (ts unique per key, the q254 contract); ``bound_micro``
    encodes ln((1-beta)/alpha) (default alpha=beta=0.05 -> ln 19).
    first_up_ts / first_dn_ts are the first crossings of +/-bound;
    the decision is whichever crossing happens FIRST (SPRT stops
    there — later samples are never seen): 'accept_h1', 'accept_h0',
    or 'continue' when neither bound is hit.

    Scale shape: ONE hash shuffle on key (the running-sum window), the
    per-key summary groupBy reuses the partitioning.  No joins, no
    Python."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    step = F.when(
        F.col(success_col).cast("long") == 1,
        F.lit(int(l_pos_micro)).cast("long"),
    ).otherwise(F.lit(int(l_neg_micro)).cast("long"))
    stepped = ledger.select(
        F.col(key_col),
        F.col(ts_col),
        F.sum(step).over(w).alias("llr"),
    )
    b = int(bound_micro)
    agg = stepped.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.max_by("llr", F.col(ts_col)).cast("long").alias(
            "llr_final_micro"
        ),
        F.min(F.when(F.col("llr") >= b, F.col(ts_col))).alias(
            "first_up_ts"
        ),
        F.min(F.when(F.col("llr") <= -b, F.col(ts_col))).alias(
            "first_dn_ts"
        ),
    )
    up = F.col("first_up_ts")
    dn = F.col("first_dn_ts")
    decision = (
        F.when(up.isNotNull() & (dn.isNull() | (up < dn)), F.lit(
            "accept_h1"
        ))
        .when(dn.isNotNull(), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    return agg.select(
        "key", "n", "llr_final_micro", "first_up_ts", "first_dn_ts",
        decision.alias("decision"),
    ).orderBy("key")


def mwu_z_sql() -> str:
    """The Mann-Whitney normal-approximation z as ONE engine-portable
    SQL expression over exact int64 columns (n_a, n_b, nn, u_a_x2,
    t3t): z = (U_a - n_a*n_b/2) / sigma with the tie-corrected
    variance sigma^2 = n_a*n_b * [nn^3 - nn - sum(t^3 - t)] /
    (12*nn*(nn-1)) (Mann & Whitney 1947; tie correction per Lehmann,
    "Nonparametrics" 1975).  The numerator u_a_x2 - n_a*n_b is exact
    int64 (U doubled); the variance bracket nn*(nn-1)*(nn+1) - t3t is
    exact int64 up to nn ~ 2e6 (the caller's envelope — subsample
    larger cohorts); the full expression text is shared with the
    DuckDB oracle, so the engines evaluate identical IEEE chains."""
    return (
        "(CAST(u_a_x2 - n_a * n_b AS DOUBLE) / (2.0 * sqrt("
        "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
        " * CAST(nn * (nn - 1) * (nn + 1) - t3t AS DOUBLE)"
        " / (12.0 * CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)))))"
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) test between the
    ``group_a`` and ``group_b`` cohorts of an integer-valued ledger —
    the RANK companion to ks_two_sample (KS asks "are the
    distributions different anywhere"; MWU asks "does one cohort
    stochastically dominate", which is the recrawl question "did this
    host get slower").  U doubles as the effect size: U/(n_a*n_b) is
    the probability a random a-value exceeds a random b-value — the
    same AUC identity evalmetrics.roc_auc_ap uses, so ``auc_ppm`` here
    and q265's AUC are the one statistic seen from two sides.

    Pinned semantics: integer values (caller casts); combined midranks
    DOUBLED to stay exact int64 (midrank_x2 = 2*rmin + ties - 1 per
    value group, rmin from the range-partitioned global sequence —
    never a SinglePartition window); U_a doubled:
    ``u_a_x2 = sum(cnt_a * midrank_x2) - n_a*(n_a+1)``; tie masses
    ``t3t = sum(ties^3 - ties)`` exact; z from :func:`mwu_z_sql` (no
    continuity correction — part of the pin); two-sided p in ppm via
    the fdr module's pinned A&S erfc.  Output one row:
    (n_a, n_b, u_a_x2, t3t, z, p_ppm, auc_ppm).

    Scale shape (100 TB): one range exchange for the global sequence,
    one map-side-combined groupBy(value) — the value table is
    cardinality-bounded — then a single-row agg.  No joins, no windows,
    no Python."""
    from eget_spark.operators.fdr import p_two_sided_ppm_sql
    from eget_spark.operators.sequence import with_global_seq

    base = df.where(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(value_col).cast("long").alias("value"),
        (F.col(group_col) == F.lit(group_a)).cast("long").alias("is_a"),
    )
    res = with_global_seq(base, ["value"], start=1, seq_col="_r")
    groups = res.df.groupBy("value").agg(
        F.min("_r").cast("long").alias("rmin"),
        F.count("*").cast("long").alias("ties"),
        F.sum("is_a").cast("long").alias("cnt_a"),
    )
    agg = groups.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        (F.sum("ties") - F.sum("cnt_a")).cast("long").alias("n_b"),
        F.sum("ties").cast("long").alias("nn"),
        F.sum(
            F.col("cnt_a") * (2 * F.col("rmin") + F.col("ties") - 1)
        ).cast("long").alias("ra_x2"),
        F.sum(
            F.col("ties") * F.col("ties") * F.col("ties") - F.col("ties")
        ).cast("long").alias("t3t"),
    ).localCheckpoint()
    res.unpersist()
    z = mwu_z_sql()
    # zero tie-corrected variance (every value identical) has no defined
    # z: emit NULL rather than divide by zero (ANSI mode) — the guard is
    # part of the pin and mirrored in oracle SQL
    guard = "nn * (nn - 1) * (nn + 1) - t3t > 0"
    return agg.select(
        "n_a",
        "n_b",
        F.expr("ra_x2 - n_a * (n_a + 1)").cast("long").alias("u_a_x2"),
        "t3t",
        "nn",
    ).select(
        "n_a",
        "n_b",
        "u_a_x2",
        "t3t",
        F.expr(f"CASE WHEN {guard} THEN round({z}, 6) END").alias("z"),
        F.expr(
            f"CASE WHEN {guard} THEN {p_two_sided_ppm_sql(z)} END"
        ).alias("p_ppm"),
        F.expr(
            "u_a_x2 * CAST(500000 AS BIGINT) DIV (n_a * n_b)"
        ).cast("long").alias("auc_ppm"),
    )


def kw_h_sql(k: int) -> str:
    """Tie-corrected Kruskal-Wallis H as ONE engine-portable SQL
    expression over exact int64 columns (r_1..r_k = DOUBLED per-group
    rank sums, m_1..m_k = group sizes, nn, t3t): with doubled ranks
    12*(r/2)^2 = 3*r^2, so

        H = [3 * sum_j r_j^2/m_j] / (nn*(nn+1)) - 3*(nn+1),
        H' = H / (1 - t3t / (nn^3 - nn))

    (Kruskal & Wallis JASA 1952).  The k-term sum is written in the
    literal group order — the whole chain is one pinned IEEE expression
    over exact integers, no cross-row double sums anywhere."""
    terms = " + ".join(
        f"(CAST(r_{j} AS DOUBLE) * CAST(r_{j} AS DOUBLE)"
        f" / CAST(m_{j} AS DOUBLE))"
        for j in range(1, k + 1)
    )
    h_raw = (
        f"((3.0 * ({terms}))"
        " / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))"
        " - 3.0 * CAST(nn + 1 AS DOUBLE))"
    )
    corr = (
        "(1.0 - CAST(t3t AS DOUBLE)"
        " / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)"
        " * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)))"
    )
    return f"({h_raw} / {corr})"


def kw_p_sql(h_sql: str, dfree: int) -> str | None:
    """Exact chi-square survival function for EVEN degrees of freedom
    as a closed-form SQL expression in ppm:
    Q(h; df) = exp(-h/2) * sum_{i<df/2} (h/2)^i / i! — the pinned
    exp-family discipline.  Returns None for odd df (no elementary
    closed form; callers emit NULL and document it)."""
    if dfree < 2 or dfree % 2:
        return None
    half = f"(({h_sql}) / 2.0)"
    terms = ["1.0"]
    for i in range(1, dfree // 2):
        import math as _math

        terms.append(f"(pow({half}, {i}.0) / {float(_math.factorial(i))})")
    series = " + ".join(terms)
    return f"CAST(round(1e6 * exp(-{half}) * ({series})) AS BIGINT)"


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    groups: list[str],
) -> DataFrame:
    """k-sample Kruskal-Wallis rank test — "do these k host tiers share
    one latency distribution?" — the one-way-ANOVA-on-ranks extension
    of mann_whitney_u (k=2 reduces to it).  ``groups`` pins k at plan
    time, so the H statistic is a SINGLE pinned expression over the
    k doubled rank sums (kw_h_sql) and the chi-square p (df = k-1) uses
    the exact even-df closed form (kw_p_sql; odd df emits NULL p —
    documented limitation, pick an even number of tiers minus one...
    i.e. an ODD k gives an even df and an exact p).

    Pinned semantics: integer values; doubled midranks from the
    range-partitioned global sequence (the mann_whitney_u machinery);
    all moments exact int64 (the nn^3 envelope: cohorts beyond ~2e6
    rows total need subsampling); H NULL when every value is tied
    (zero tie-correction denominator) or nn < 2.  Output one row:
    (nn, t3t, m_1..m_k, r_1..r_k, h, p_ppm).

    Scale shape: identical to mann_whitney_u — one range exchange, one
    map-side-combined groupBy(value), one single-row agg.  No joins,
    no windows over data-sized frames, no Python."""
    from eget_spark.operators.sequence import with_global_seq

    k = len(groups)
    if k < 2:
        raise ValueError("kruskal_wallis needs >= 2 groups")
    base = df.where(F.col(group_col).isin(list(groups))).select(
        F.col(value_col).cast("long").alias("value"),
        *[
            (F.col(group_col) == F.lit(g)).cast("long").alias(f"g_{j}")
            for j, g in enumerate(groups, start=1)
        ],
    )
    res = with_global_seq(base, ["value"], start=1, seq_col="_r")
    per_v = res.df.groupBy("value").agg(
        F.min("_r").cast("long").alias("rmin"),
        F.count("*").cast("long").alias("ties"),
        *[
            F.sum(f"g_{j}").cast("long").alias(f"c_{j}")
            for j in range(1, k + 1)
        ],
    )
    mid = "(2 * rmin + ties - 1)"
    agg = per_v.agg(
        F.sum("ties").cast("long").alias("nn"),
        F.sum(
            F.col("ties") * F.col("ties") * F.col("ties") - F.col("ties")
        ).cast("long").alias("t3t"),
        *[
            F.sum(f"c_{j}").cast("long").alias(f"m_{j}")
            for j in range(1, k + 1)
        ],
        *[
            F.sum(F.expr(f"c_{j} * {mid}")).cast("long").alias(f"r_{j}")
            for j in range(1, k + 1)
        ],
    ).localCheckpoint()
    res.unpersist()
    h = kw_h_sql(k)
    p = kw_p_sql(h, k - 1)
    guard = "nn > 1 AND t3t < nn * nn * nn - nn"
    return agg.select(
        "nn",
        "t3t",
        *[F.col(f"m_{j}") for j in range(1, k + 1)],
        *[F.col(f"r_{j}") for j in range(1, k + 1)],
        F.expr(f"CASE WHEN {guard} THEN round({h}, 6) END").alias("h"),
        (
            F.expr(f"CASE WHEN {guard} THEN {p} END").alias("p_ppm")
            if p is not None
            else F.lit(None).cast("long").alias("p_ppm")
        ),
    )
