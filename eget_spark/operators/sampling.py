"""Deterministic stratified sampling (training-data corpus balancing).

A 100 TB corpus is rarely trained on whole: pipelines subsample per
stratum (language, source, quality bucket) to a target count. Random
sampling breaks reproducibility and resume; this operator instead ranks
rows *within each stratum by a stable hash of their id* and keeps the
first n — a deterministic, seed-able, order-independent sample that is
identical across retries, partitionings, and engines (md5 is the rank
key, available in both Spark and ANSI SQL).

Plan shape: one hash-partitioned window per stratum with
WindowGroupLimit pushing the rank filter map-side — no global sort, no
driver involvement; skewed strata cost one reducer each at worst, and
the rank filter discards rows before shuffle where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str,
    seed: str = "",
) -> DataFrame:
    """Keep ``n_per_group`` rows per ``group_col`` value, chosen by md5
    hash order of ``seed || id`` (ties broken by id) — deterministic and
    reproducible. Returns the input columns unchanged."""
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_srk", F.row_number().over(w))
        .where(F.col("_srk") <= n_per_group)
        .drop("_srk")
    )


def proportional_mix(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    total: int,
    id_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic corpus mixing to target proportions: keep
    ``round(weights[g] * total)`` rows of each stratum ``g`` (strata
    absent from ``weights`` are dropped), chosen by the same stable
    md5-of-id order as :func:`stratified_sample` — the
    domain-reweighting step of a training-data pipeline (e.g. 60% web /
    30% code / 10% academic), reproducible across retries, partitionings,
    and engines.

    Per-stratum targets are fixed driver-side arithmetic on the weights
    dict (no data-dependent planning); a stratum with fewer rows than its
    target contributes all of them — callers wanting exact totals
    re-normalize weights to observed counts first.  Plan shape is
    stratified_sample's: one window per stratum, WindowGroupLimit,
    no global sort."""
    targets = {g: int(round(w * total)) for g, w in weights.items()}
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    cap = F.coalesce(
        *[
            F.when(F.col(group_col) == g, F.lit(n))
            for g, n in sorted(targets.items())
        ],
        F.lit(0),
    ) if targets else F.lit(0)
    return (
        df.withColumn("_srk", F.row_number().over(w))
        .where(F.col("_srk") <= cap)
        .drop("_srk")
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    budget: int,
    id_col: str,
    tokens_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic sampling to a TOKEN budget per stratum — the unit
    training mixes are actually specified in ("200B tokens of web, 50B of
    code"), not document counts.  Rows are taken in the same stable
    md5-of-id order as :func:`stratified_sample`; a row is kept iff its
    INCLUSIVE running token sum stays within ``budget`` — the kept set is
    a strict prefix of the stratum's hash order, so it is reproducible
    across retries/partitionings/engines and only ever shrinks when the
    budget does.  (Consequence, pinned: a stratum whose FIRST hash-ordered
    row already exceeds the budget contributes nothing; callers wanting
    best-fit packing want a different operator.)

    Plan shape: one running-sum window per stratum (the cumulative sum
    needs the stratum's rows on one reducer — same skew bound as the
    other samplers; strata are languages/sources, i.e. few and fat, and
    the window evaluates streaming without materializing the frame)."""
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(group_col)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "_run", F.sum(F.col(tokens_col).cast("long")).over(w)
        )
        .where(F.col("_run") <= budget)
        .drop("_run")
    )


def bernoulli_sample(
    df: DataFrame,
    id_col: str,
    prob_col,
    seed: str = "",
) -> DataFrame:
    """Keep each row independently with its own probability — the
    temperature / source-weighting sampler of LLM corpus mixing (each
    source gets keep-rate w_s, fractional rates included).

    Exact semantics (pinned): a row survives iff
    ``md5_60bit(seed || id) < floor(prob * 2^60)`` — the comparison is
    between two integers, so the decision is bit-identical across
    engines, retries, partitionings, and cluster sizes (the property
    ``df.sample()`` does NOT have: its outcome depends on partition
    layout).  prob <= 0 keeps nothing, prob >= 1 keeps everything.

    Plan shape: a pure projection + filter — zero shuffles, pushes past
    any downstream exchange.  ``prob_col`` may be a column name or a
    Column expression (e.g. a per-source rate joined in upstream)."""
    return df.where(bernoulli_keep(id_col, prob_col, seed))


def bernoulli_keep(id_col: str, prob_col, seed: str = ""):
    """The ``bernoulli_sample`` keep decision as a boolean column — for
    pipelines that must also record which rows were sampled OUT."""
    from .kmv import md5_60bit

    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    h = md5_60bit(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    threshold = F.floor(p.cast("double") * F.lit(float(1 << 60))).cast("long")
    return h < threshold


def split_by_group(
    df: DataFrame,
    group_col: str,
    weights: list[int] | None = None,
    names: list[str] | None = None,
    seed: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every row of a GROUP
    (host, registrable domain, dedup cluster) lands in the same split,
    so near-duplicates that share the group can never straddle the
    train/eval boundary — the group-aware split the eval-contamination
    literature prescribes (Lee et al. 2022 on dedup'd eval splits).

    Exact semantics (pinned): bucket = md5_60bit(seed || group) %
    sum(weights); split i owns the half-open bucket range
    [sum(weights[:i]), sum(weights[:i+1])).  Default 8/1/1
    train/val/test.  Adds a ``split`` column; input columns unchanged.

    Plan shape: a pure projection — the hash is computed per row from
    the group value itself, so there is NO join against a group table
    and NO shuffle; consistent assignment falls out of the hash being a
    function of the group alone."""
    from .kmv import md5_60bit

    weights = weights or [8, 1, 1]
    names = names or ["train", "val", "test"]
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = sum(weights)
    # NULL groups hash as the empty string: they form one deterministic
    # group (all NULL-group rows share a split) instead of silently
    # landing in split=NULL via a NULL hash
    bucket = (
        md5_60bit(
            F.concat(
                F.lit(seed),
                F.coalesce(F.col(group_col).cast("string"), F.lit("")),
            )
        )
        % total
    )
    # build CASE from the first split upward: bucket < c1 -> names[0], etc.
    cuts = []
    acc = 0
    for w in weights:
        acc += w
        cuts.append(acc)
    expr = F.when(bucket < cuts[0], F.lit(names[0]))
    for i in range(1, len(names)):
        expr = expr.when(bucket < cuts[i], F.lit(names[i]))
    return df.withColumn("split", expr)


def mixture_weights(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    target_ppm: dict[str, int],
) -> DataFrame:
    """Importance-reweighting plan per stratum (the DoReMi/The-Pile-style
    domain-mixture step, public papers): compare each group's observed
    token share against a target share and emit the downsampling weight.

    Output per group: ``n_docs``, ``n_tokens``, ``corpus_ppm`` (observed
    share, int64 parts-per-million by floor division), ``target_ppm``
    (0 for groups absent from the plan), ``weight_ppm`` = min(1e6,
    target_ppm * 1e6 div corpus_ppm) — capped at 1.0 because a sampling
    pass can only DOWNsample (upsampling = duplication is a separate,
    deliberate op), and ``sampled_tokens_est`` = n_tokens * weight_ppm
    div 1e6.  All int64 floor arithmetic — exact across engines and
    partitionings, never a float share.

    Plan shape: one map-side-combined groupBy (|groups| rows), the
    corpus total rides a 1-row broadcast join; nothing here touches the
    corpus a second time.  The weights table then broadcasts into
    :func:`bernoulli_sample`-style keep decisions (p = weight_ppm/1e6).
    """
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).cast("long").alias("n_tokens"),
    )
    total = per.agg(
        F.sum("n_tokens").cast("long").alias("_total")
    )
    tgt = F.coalesce(
        *[
            F.when(F.col("grp") == g, F.lit(int(p)).cast("long"))
            for g, p in sorted(target_ppm.items())
        ],
        F.lit(0).cast("long"),
    ) if target_ppm else F.lit(0).cast("long")
    # Overflow guard: n_tokens * 1e6 leaves int64 past ~9.2e12 tokens
    # (a ~40 TB stratum).  Scale numerator and denominator down by
    # s = max(1, _total div 2^43) first — s=1 (bit-identical to the
    # naive form) up to 8.8e12-token corpora, and a pinned <=1ppm-
    # relative-drift integer approximation beyond; the oracle mirrors
    # the same integer ops.
    _s = "greatest(1, _total div 8796093022208)"
    out = per.crossJoin(F.broadcast(total)).select(
        "grp",
        "n_docs",
        "n_tokens",
        F.expr(
            f"(n_tokens div {_s}) * 1000000 div (_total div {_s})"
        ).cast("long").alias("corpus_ppm"),
        tgt.alias("target_ppm"),
    )
    weight = F.least(
        F.lit(1_000_000).cast("long"),
        # greatest(.,1): a sub-ppm stratum floors to corpus_ppm=0; treat
        # as 1 ppm so the division is defined (and capped) on any engine
        F.expr("target_ppm * 1000000 div greatest(corpus_ppm, 1)").cast(
            "long"
        ),
    )
    return out.withColumn("weight_ppm", weight).withColumn(
        # exact long-division split of n_tokens * weight_ppm div 1e6:
        # floor(n*w/M) = (n div M)*w + ((n mod M)*w) div M — the same
        # value as the naive product, without its ~9.2e12-token ceiling
        "sampled_tokens_est",
        F.expr(
            "(n_tokens div 1000000) * weight_ppm"
            " + (n_tokens % 1000000) * weight_ppm div 1000000"
        ).cast("long"),
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    budget_tokens: int,
    max_epochs_ppm: int = 4_000_000,
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICLR 2023, public paper):
    spread a total training-token budget as UNIFORMLY as possible across
    strata (languages/domains) subject to a per-stratum repetition cap of
    ``max_epochs_ppm`` epochs (parts-per-million: 4_000_000 = at most 4
    passes over a stratum) — the fairness-first alternative to
    temperature sampling that never over-repeats a small stratum.

    The paper's greedy (ascending-capacity water-filling) has a closed
    form over the capacity prefix sums, so the whole plan is window
    arithmetic on the |groups|-row aggregate: with capacities
    ``cap_i = n_i * max_epochs_ppm div 1e6`` sorted ascending (ties by
    group key), position i of D, prefix sum S_i, a stratum is CAPPED
    (gets its full capacity) iff ``S_i + cap_i*(D-i) <= B`` — the
    maximal such prefix k leaves ``rem = B - S_k`` to split equally
    among the ``m = D-k`` uncapped strata: ``base = rem div m`` each,
    with the ``rem mod m`` leftover tokens granted one apiece to the
    first uncapped strata in the same ascending order (a pinned,
    engine-independent tie rule; UniMax's real-valued split is this
    integer split's limit).  If the budget exceeds total capacity,
    every stratum is capped and ``leftover = B - S_D`` goes unspent
    (reported via ``alloc_tokens`` summing short of the budget).

    Output per stratum: ``n_docs``, ``n_tokens``, ``cap_tokens``,
    ``alloc_tokens``, ``epochs_ppm = alloc*1e6 div n_tokens`` — all
    int64 floor arithmetic, bit-exact across engines and partitionings.

    Scale shape: ONE map-side-combined groupBy over the corpus; every
    window after that runs over the |groups|-row plan table (dimension-
    sized — thousands of rows at worst, one reducer by design), so the
    single-partition windows are on the plan, never the data.  The
    emitted plan broadcasts back into a stratified-sample keep pass.
    """
    B = int(budget_tokens)
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).cast("long").alias("n_tokens"),
    )
    per = per.withColumn(
        "cap_tokens",
        F.expr(f"n_tokens * {int(max_epochs_ppm)} div 1000000").cast("long"),
    )
    asc = Window.orderBy("cap_tokens", "grp")
    full = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        per.withColumn("_i", F.row_number().over(asc).cast("long"))
        .withColumn("_s", F.sum("cap_tokens").over(asc).cast("long"))
        .withColumn("_d", F.count(F.lit(1)).over(full).cast("long"))
    )
    ranked = ranked.withColumn(
        "_capped",
        F.expr(f"_s + cap_tokens * (_d - _i) <= {B}"),
    )
    # k = size of the maximal capped prefix; S_k = its capacity sum.
    # _capped is monotone (true-prefix) by the water-filling argument, so
    # max-over-capped equals the prefix length.
    agg = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("_capped"), F.col("_i"))), F.lit(0)
        ).cast("long").alias("_k"),
        F.coalesce(
            F.max(F.when(F.col("_capped"), F.col("_s"))), F.lit(0)
        ).cast("long").alias("_sk"),
    )
    out = ranked.crossJoin(F.broadcast(agg)).select(
        "grp",
        "n_docs",
        "n_tokens",
        "cap_tokens",
        F.expr(
            f"""CASE WHEN _capped THEN cap_tokens ELSE
              ({B} - _sk) div (_d - _k)
              + CASE WHEN _i - _k <= ({B} - _sk) % (_d - _k)
                     THEN 1 ELSE 0 END
            END"""
        ).cast("long").alias("alloc_tokens"),
    )
    return out.withColumn(
        "epochs_ppm",
        F.expr(
            "CASE WHEN n_tokens > 0 THEN alloc_tokens * 1000000"
            " div n_tokens ELSE 0 END"
        ).cast("long"),
    )


def weighted_sample_ares(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "",
) -> DataFrame:
    """Weighted random sampling without replacement, the A-Res scheme of
    Efraimidis & Spirakis (IPL 2006): each row draws a uniform
    ``u in (0,1)`` and keeps key ``u^(1/w)``; the k largest keys ARE a
    weighted sample without replacement.  The distributed-sampling
    classic: one pass, no coordination, mergeable by taking the global
    top-k of per-partition top-ks — exactly what TakeOrdered does.

    Pinned determinism (the q106/bernoulli recipe): ``u`` comes from the
    repo-standard portable 60-bit md5 of ``seed || id``
    (``u = max(h,1)/2^60`` — the max() guards the measure-zero h=0), and
    the ranking key is the monotone transform ``ln(u)/w`` (avoids
    pow()), a fixed IEEE expression over exact integers — bit-identical
    across engines, retries, partitionings, and cluster sizes, which
    ``df.sample()`` is not.  Keys round to 6 for the emitted column;
    ties break by id.

    Scale shape: a pure projection + TakeOrdered — zero shuffles before
    the top-k reduction; weights never leave the row.

    Returns the k sampled rows: (id, weight, es_key), es_key DESC."""
    from .kmv import md5_60bit

    h = md5_60bit(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    u = F.greatest(h, F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "id")
        .limit(k)
    )


def ipf_raking(
    df: DataFrame,
    row_col: str = "lang",
    col_col: str = "source",
    n_rounds: int = 3,
) -> DataFrame:
    """Iterative proportional fitting / raking (Deming & Stephan,
    Annals of Math. Stat. 1940): per-cell sampling weights that make
    BOTH marginals of a two-way contingency table hit uniform targets
    simultaneously — the two-dimensional generalization of q54's
    proportional mix and q224's UniMax (each balances ONE dimension;
    raking balances lang AND source at once, the survey-statistics
    workhorse).

    Pinned semantics (the q250 fixed-round discipline): cell counts
    are exact int64; weights live in ppm starting at 1_000_000; per
    round, rows then columns are scaled by the pinned ppm factor
    ``f = round(target_mass * 1e6 / current_mass)`` — ONE IEEE double
    division+round per margin per sweep (deterministic in both engines;
    an all-integer ``t*1e6 DIV cur`` would overflow int64 past ~2e8
    input rows) — then ``w' = w * f DIV 1e6`` exactly (mass = sum n*w
    per margin; uniform targets ``total * 1e6 DIV |categories|``);
    exactly ``n_rounds`` (row, col) sweeps — no convergence test, the
    fixed-round bit-exact contract.  After the
    final COLUMN sweep the column marginals are exact (up to DIV
    floors) and the row marginals are one sweep stale — IPF's
    alternating nature, pinned rather than hidden.

    Output: (r, c, n, w_ppm) ordered (r, c).

    Scale shape (100 TB): ONE map-side-combined groupBy reduces the
    corpus to its R x C cell table (combine absorbs all skew — the
    table is category-squared sized, broadcast class); every round is
    margin-sized joins on that tiny table, localCheckpointed per round
    so the plan stays bounded.  No windows, no Python."""
    cells = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count("*").cast("long").alias("n"))
    state = cells.withColumn(
        "w", F.lit(1_000_000).cast("long")
    ).localCheckpoint()
    tot = state.agg(
        F.sum("n").cast("long").alias("total"),
        F.count_distinct("r").cast("long").alias("nr"),
        F.count_distinct("c").cast("long").alias("nc"),
    ).collect()[0]
    t_row = tot["total"] * 1_000_000 // tot["nr"]
    t_col = tot["total"] * 1_000_000 // tot["nc"]
    for _ in range(n_rounds):
        rmass = state.groupBy("r").agg(
            F.sum(F.col("n") * F.col("w")).cast("long").alias("cur")
        )
        state = (
            state.join(F.broadcast(rmass), "r")
            .withColumn(
                "w",
                F.expr(
                    f"w * CAST(round(CAST({t_row} AS DOUBLE) * 1e6"
                    " / CAST(cur AS DOUBLE)) AS BIGINT) DIV 1000000"
                ).cast("long"),
            )
            .drop("cur")
        )
        cmass = state.groupBy("c").agg(
            F.sum(F.col("n") * F.col("w")).cast("long").alias("cur")
        )
        state = (
            state.join(F.broadcast(cmass), "c")
            .withColumn(
                "w",
                F.expr(
                    f"w * CAST(round(CAST({t_col} AS DOUBLE) * 1e6"
                    " / CAST(cur AS DOUBLE)) AS BIGINT) DIV 1000000"
                ).cast("long"),
            )
            .drop("cur")
            .localCheckpoint()
        )
    return state.select(
        "r", "c", "n", F.col("w").alias("w_ppm")
    ).orderBy("r", "c")


def negative_sampling_table(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """word2vec-style negative-sampling distribution (Mikolov et al.
    NeurIPS 2013 §2.2): noise words drawn proportionally to the unigram
    count raised to 3/4 — the exponent that famously outperforms both
    uniform and raw-frequency sampling by flattening the Zipf head.
    Any embedding or contrastive pipeline over the corpus needs this
    table; the 3/4 power is THE published constant.

    Pinned semantics: engine-wide TOKEN_SPLIT vocabulary counts;
    ``s_micro = round(1e6 * exp(0.75 * ln(cnt)))`` (exp∘ln instead of
    pow — the transcendental pair both engines already agree on across
    the q-suite); shares are ONE IEEE-rounded double division each
    (``round(s*1e6/total)`` — an all-integer s*1e6 would overflow int64
    on web-scale heads), raw-frequency shares reported alongside so the
    flattening is visible.  Top-k by (cnt desc, tok) via mergeable
    TakeOrdered.  Output (tok, cnt, s_micro, share_ppm, raw_ppm).

    Scale shape: one explode -> map-side-combined vocab count; scalars
    on a 1-row broadcast; TakeOrdered top-k.  No windows, no Python."""
    from ..functions.text import word_vocab

    vocab = word_vocab(df, text_col)
    s_micro = F.round(
        1e6 * F.exp(0.75 * F.log(F.col("cnt").cast("double")))
    ).cast("long")
    scored = vocab.select("word", "cnt", s_micro.alias("s_micro"))
    tot = scored.agg(
        F.sum("s_micro").cast("long").alias("s_tot"),
        F.sum("cnt").cast("long").alias("c_tot"),
    )
    return (
        scored.crossJoin(F.broadcast(tot))
        .select(
            F.col("word").alias("tok"),
            "cnt",
            "s_micro",
            F.round(
                F.col("s_micro").cast("double")
                * 1e6
                / F.col("s_tot").cast("double")
            )
            .cast("long")
            .alias("share_ppm"),
            F.round(
                F.col("cnt").cast("double")
                * 1e6
                / F.col("c_tot").cast("double")
            )
            .cast("long")
            .alias("raw_ppm"),
        )
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(k)
    )


def ht_estimate(
    sample: DataFrame,
    value_col: str,
    pi_ppm_col: str,
) -> DataFrame:
    """Horvitz-Thompson design-based estimation from an unequal-
    probability sample (Horvitz & Thompson JASA 1952): given ONLY the
    sampled rows and each row's inclusion probability, estimate the
    FULL-corpus total of ``value_col`` without bias:

        T_hat = sum y_i / pi_i
        Var   = sum y_i^2 (1 - pi_i) / pi_i^2   (Poisson sampling)

    This is how a 0.1% QA sample answers "how many tokens does the
    whole crawl hold" with an honest standard error — and unequal pi
    (oversample rare strata, undersample the head) is exactly what the
    q245/q122 weighted samplers emit.  The design-based sibling of
    q144's capture-recapture (two samples, no pi) and q292's Chao1
    (abundance-based, no design at all).

    Pinned semantics (all truncating integer steps, in this order):
    per-row expanded value ``w = y * 1e6 DIV pi_ppm`` (so ht_total is
    in the same units as y), variance term
    ``var_term = w * (1e6 - pi_ppm) DIV 1e6 * w`` — the exact integer
    rendering of y^2 (1-pi)/pi^2 with the (1-pi) factor interleaved so
    the intermediate stays inside int64.  Every cross-row sum is exact
    int64; the SE is ONE final IEEE sqrt, rounded.  Envelope: the
    final ``* w`` bounds the expanded per-row value at ~3e9 (y/pi
    beyond that needs milli-unit scaling upstream).

    Scale shape (100 TB): a single map-side-combined aggregate over
    the SAMPLE (already tiny by construction).  No shuffle beyond the
    1-row combine, no windows, no joins, no Python."""
    rows = sample.select(
        F.col(value_col).cast("long").alias("y"),
        F.col(pi_ppm_col).cast("long").alias("pi"),
    ).where((F.col("pi") > 0) & (F.col("pi") <= 1_000_000))
    terms = rows.select(
        "y",
        "pi",
        F.expr("y * CAST(1000000 AS BIGINT) DIV pi").alias("w"),
    ).select(
        "y",
        "pi",
        "w",
        F.expr(
            "w * (CAST(1000000 AS BIGINT) - pi)"
            " DIV CAST(1000000 AS BIGINT) * w"
        ).alias("var_term"),
    )
    agg = terms.agg(
        F.count("*").cast("long").alias("n_sample"),
        F.sum("y").cast("long").alias("sample_total"),
        F.sum("w").cast("long").alias("ht_total"),
        F.sum("var_term").cast("long").alias("var_sum"),
    )
    return agg.select(
        "n_sample",
        "sample_total",
        "ht_total",
        "var_sum",
        F.expr(
            "CAST(round(sqrt(CAST(var_sum AS DOUBLE))) AS BIGINT)"
        ).alias("se"),
    )
