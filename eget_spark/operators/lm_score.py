"""Corpus-trained unigram language-model document scoring.

CCNet (Wenzek et al. 2020, public paper) ranks web documents by the
perplexity of a language model trained on clean text and drops the worst
tail — the standard "does this read like language at all" filter in
web-scale training-data pipelines.  A full KenLM is out of scope for a
pure-Spark engine, but the unigram reduction is exactly expressible as
dataflow and already separates gibberish/boilerplate from prose: train a
unigram LM on the corpus itself (or any reference corpus), then score
every document by its mean token log-probability.

Pinned semantics (so the DuckDB oracle reproduces them bit-for-bit):

- tokens    = lowercased runs split on ``[^a-z0-9]+`` (after ``lower``),
  empty tokens dropped
- LM        = add-one-smoothed unigram model over the TRAINING corpus:
  ``logprob(t) = ln((count(t) + 1) / (N + V))`` where N = total token
  occurrences and V = distinct tokens; unseen tokens score
  ``ln(1 / (N + V))``
- doc score = ``round(sum(logprob(t) * k_t) / n_tokens, 6)`` over the
  document's tokens (k_t = in-doc count); docs with no tokens get NULL
  score and ``n_tokens = 0``

Scale shape (100 TB): training is one explode -> groupBy(token) count —
a map-side-combined HashAggregate on a uniform-ish key (Zipf skew on
"the" is absorbed by the partial combine: each map task emits ONE row
per hot token).  Scoring first reduces each doc to its distinct (id,
token, k) rows (same partial-combine argument), then hash-joins that
against the vocabulary on token.  The vocab-side key is unique, so the
join replicates nothing; residual shuffle skew on hot tokens is bounded
by the distinct-doc count and split by AQE skew-join.  The N/V scalars
ride a 1-row broadcast cross join (the pagerank dangling-mass shape) —
no driver round-trip, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def _tok_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok, k): per-document distinct tokens with in-doc counts."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    return toks.groupBy("id", "tok").agg(F.count("*").cast("long").alias("k"))


def unigram_lm(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Train the add-one-smoothed unigram LM: (tok, cnt, logprob).

    Also carries the model scalars (n_total, v_size) on every row so a
    scorer joining this table needs no second aggregate."""
    counts = (
        _tok_rows(df, id_col, text_col)
        .groupBy("tok")
        .agg(F.sum("k").cast("long").alias("cnt"))
    )
    scalars = counts.agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("v_size"),
    )
    return counts.crossJoin(F.broadcast(scalars)).withColumn(
        "logprob",
        F.log((F.col("cnt") + 1) / (F.col("n_total") + F.col("v_size"))),
    )


def unigram_doc_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, lm_score) per document.

    ``lm`` defaults to a model trained on ``df`` itself (self-scoring —
    the CCNet setup scores against a clean reference corpus; pass its
    :func:`unigram_lm` table for that).  ``lm_score`` is the mean token
    log-probability (natural log; higher = more like the training
    corpus); NULL for token-less documents."""
    if lm is None:
        lm = unigram_lm(df, id_col, text_col)
    doc_toks = _tok_rows(df, id_col, text_col)
    # unseen tokens (only possible with an external lm) fall to the
    # smoothing floor ln(1/(N+V)); the scalars ride a 1-row broadcast of
    # their own — the left join nulls the lm columns for unseen tokens,
    # so the floor cannot be computed from the joined row
    scalars = lm.agg(
        F.max("n_total").alias("n_total"), F.max("v_size").alias("v_size")
    )
    floor = F.log(1 / (F.col("n_total") + F.col("v_size")))
    scored = (
        doc_toks.join(lm.select("tok", "logprob"), "tok", "left")
        .crossJoin(F.broadcast(scalars))
        .withColumn("lp", F.coalesce(F.col("logprob"), floor))
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("lp") * F.col("k")) / F.sum("k"), 6).alias(
                "lm_score"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "lm_score",
        )
    )


# ---------------------------------------------------------------------------
# Bigram LM with stupid backoff
# ---------------------------------------------------------------------------

STUPID_BACKOFF_ALPHA = 0.4


def _bigram_arr(text_col: str):
    """Per-row array of space-joined bigrams, built WITHOUT an explode or a
    positional self-join: zip the token array against itself shifted by one
    (`zip_with(slice(a,1,n-1), slice(a,2,n-1))`) — a pure codegen'd
    projection.  Empty for docs with < 2 tokens."""
    a = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != F.lit("")
    )
    n = F.size(a)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(a, 1, n - 1),
            F.slice(a, 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, k): per-document distinct bigrams with in-doc counts."""
    bg = df.select(
        F.col(id_col).alias("id"), F.explode(_bigram_arr(text_col)).alias("bg")
    ).select(
        "id",
        F.split("bg", " ").getItem(0).alias("w1"),
        F.split("bg", " ").getItem(1).alias("w2"),
    )
    return bg.groupBy("id", "w1", "w2").agg(F.count("*").cast("long").alias("k"))


def bigram_doc_scores(
    df: DataFrame,
    train_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> DataFrame:
    """Stupid-backoff bigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the public web-scale LM
    recipe: no normalization, unnormalized score S instead of P):

        S(w2 | w1) = c(w1 w2) / c(w1)                 if c(w1 w2) > 0
                   = alpha * (c(w2) + 0.5) / (T + 1)  otherwise

    where counts come from the TRAINING corpus, T = its total token count,
    and the +0.5/+1 floor keeps OOV words finite (the CCNet-style smoothing
    floor, pinned so the SQL oracle reproduces it exactly).  A doc's score
    is its mean bigram ln S; docs with < 2 tokens score NULL.

    Scale shape (100 TB): the LM is two map-side-combined counts (bigram,
    unigram) over the training corpus; scoring reduces each doc to its
    DISTINCT bigrams (partial combine bounds hot-bigram fan-in), then
    hash-joins against the two count tables on unique keys — replication-
    free joins, AQE splits residual skew.  The T scalar rides a 1-row
    broadcast.  No driver loops, no collect.

    Returns (id, n_bigrams, lm2_score).
    """
    uni = (
        _tok_rows(train_df, id_col, text_col)
        .groupBy("tok")
        .agg(F.sum("k").cast("long").alias("cnt"))
    )
    bi = (
        _bigram_rows(train_df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.sum("k").cast("long").alias("c12"))
    )
    scalars = uni.agg(F.sum("cnt").cast("long").alias("t_total"))
    doc_bi = _bigram_rows(df, id_col, text_col)
    floor = F.log(
        F.lit(alpha)
        * (F.coalesce(F.col("c2"), F.lit(0)) + 0.5)
        / (F.col("t_total") + 1.0)
    )
    scored = (
        doc_bi.join(bi, ["w1", "w2"], "left")
        .join(uni.select(F.col("tok").alias("w1"), F.col("cnt").alias("c1")), "w1", "left")
        .join(uni.select(F.col("tok").alias("w2"), F.col("cnt").alias("c2")), "w2", "left")
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "lp",
            F.when(F.col("c12") > 0, F.log(F.col("c12") / F.col("c1"))).otherwise(
                floor
            ),
        )
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("lp") * F.col("k")) / F.sum("k"), 6).alias(
                "lm2_score"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm2_score",
        )
    )


def kneser_ney_doc_scores(
    df: DataFrame,
    train_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount_ppm: int = 750_000,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney ICASSP 1995;
    Chen & Goodman 1998 — THE standard n-gram smoothing, the one KenLM
    ships by default and CCNet's perplexity filter actually runs):

        P_KN(w|v) = max(c(vw) - D, 0) / c(v.)
                    + D * N1+(v.) / c(v.) * Pcont(w)
        Pcont(w)  = N1+(.w) / N1+(..)

    with absolute discount ``D = discount_ppm/1e6`` (0.75 pinned — Chen
    & Goodman's fixed-discount variant; estimating D from n1/n2 is a
    one-line change that would unpin the oracle).  ``c(v.)`` is the
    bigram-context total, ``N1+`` are continuation type counts — the
    insight that "Francisco" follows only "San" however frequent it is.
    Pinned backoff floors so every probability is positive and the SQL
    oracle reproduces them exactly: an UNSEEN context v scores
    ``Pcont(w)`` alone, and a w never seen as a continuation takes the
    half-type floor ``Pcont = 1/(2 * N1+(..))`` — both expressed as
    ``greatest(2*N1+(.w), 1) / (2*N1+(..))``.

    Determinism contract: per-bigram ``lp_micro = round(ln(P)*1e6)`` is
    quantized to int64 BEFORE any cross-row aggregation, so doc sums are
    exact integer sums (engine/partition summation order cannot perturb
    them — the q191 micro-unit recipe, one step stricter than q75's
    float mean).  ``kn_mean`` is one final float division of two exact
    integers, rounded to 6.

    Scale shape (100 TB): identical to :func:`bigram_doc_scores` — two
    map-side-combined count aggregates over the training corpus (hot
    bigrams collapse per task), per-doc distinct-bigram reduction, three
    replication-free hash joins on unique keys (AQE splits residual hot
    tokens), the N1+(..) scalar on a 1-row broadcast.  No collect, no
    Python, no window.

    Returns (id, n_bigrams, kn_sum_micro, kn_mean); docs with < 2 tokens
    get (0, 0, NULL).
    """
    D = discount_ppm / 1e6
    bi = (
        _bigram_rows(train_df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.sum("k").cast("long").alias("c12"))
    )
    ctx = bi.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1fwd"),
    )
    cont = bi.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1w"))
    scal = bi.agg(F.count(F.lit(1)).cast("long").alias("btypes"))
    doc_bi = _bigram_rows(df, id_col, text_col)
    pc = F.greatest(2 * F.coalesce(F.col("n1w"), F.lit(0)), F.lit(1)) / (
        2.0 * F.col("btypes")
    )
    p = F.when(
        F.col("c1").isNotNull(),
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - F.lit(D), F.lit(0.0))
        / F.col("c1")
        + F.lit(D) * F.col("n1fwd") / F.col("c1") * pc,
    ).otherwise(pc)
    scored = (
        doc_bi.join(bi, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(scal))
        .withColumn("lp_micro", F.round(F.log(p) * 1e6, 0).cast("long"))
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("lp_micro")).cast("long").alias(
                "kn_sum_micro"
            ),
        )
        .withColumn(
            "kn_mean",
            F.round(F.col("kn_sum_micro") / 1e6 / F.col("n_bigrams"), 6),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("kn_sum_micro", F.lit(0)).cast("long").alias(
                "kn_sum_micro"
            ),
            "kn_mean",
        )
    )


def moore_lewis_scores(
    df: DataFrame,
    in_domain_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Moore-Lewis cross-entropy difference data selection (Moore &
    Lewis, ACL 2010 "Intelligent Selection of Language Model Training
    Data" — THE standard recipe for picking in-domain-like segments out
    of a giant general pool; the method behind most "domain-matched
    subset" corpora).  Each pool document scores the per-token log-ratio

        lr(w) = ln P_I(w) - ln P_O(w)

    between an IN-DOMAIN add-one unigram LM (trained on
    ``in_domain_df``) and the GENERAL pool LM (trained on ``df``);
    higher mean = reads more like the target domain relative to the
    pool.  (Moore & Lewis write it as H_O - H_I in cross-entropy form —
    same quantity, sign flipped so "bigger is better" here.)

    Pinned contract (the kneser_ney micro-unit recipe): per distinct
    token, ``lr_micro = round((lnP_I - lnP_O) * 1e6)`` quantizes to
    int64 BEFORE any cross-row sum; doc totals are exact integer sums
    (k_t-weighted), the mean one final division rounded to 6.  Tokens
    unseen by a model take its add-one floor ``ln(1/(N+V))`` — for the
    pool LM that floor is dead when scoring the pool itself, live when
    scoring external text.

    Scale shape (100 TB): two independent LM trainings (map-side-
    combined token rollups), per-doc distinct-token reduction, two
    replication-free hash joins on the unique vocab key (AQE splits
    residual hot tokens), model scalars on 1-row broadcasts.  No
    collect, no Python, no window.

    Returns (id, n_tokens, ml_sum_micro, ml_mean); token-less docs get
    (0, 0, NULL)."""
    lm_i = unigram_lm(in_domain_df, id_col, text_col)
    lm_o = unigram_lm(df, id_col, text_col)
    doc_toks = _tok_rows(df, id_col, text_col)
    si = lm_i.agg(
        F.max("n_total").alias("_ni"), F.max("v_size").alias("_vi")
    )
    so = lm_o.agg(
        F.max("n_total").alias("_no"), F.max("v_size").alias("_vo")
    )
    floor_i = F.log(1 / (F.col("_ni") + F.col("_vi")))
    floor_o = F.log(1 / (F.col("_no") + F.col("_vo")))
    scored = (
        doc_toks.join(
            lm_i.select("tok", F.col("logprob").alias("_lpi")), "tok", "left"
        )
        .join(
            lm_o.select("tok", F.col("logprob").alias("_lpo")), "tok", "left"
        )
        .crossJoin(F.broadcast(si))
        .crossJoin(F.broadcast(so))
        .withColumn(
            "lr_micro",
            F.round(
                (
                    F.coalesce(F.col("_lpi"), floor_i)
                    - F.coalesce(F.col("_lpo"), floor_o)
                )
                * 1e6,
                0,
            ).cast("long"),
        )
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.sum(F.col("k") * F.col("lr_micro"))
            .cast("long")
            .alias("ml_sum_micro"),
        )
        .withColumn(
            "ml_mean",
            F.round(F.col("ml_sum_micro") / 1e6 / F.col("n_tokens"), 6),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("ml_sum_micro", F.lit(0)).cast("long").alias(
                "ml_sum_micro"
            ),
            "ml_mean",
        )
    )


def witten_bell_doc_scores(
    df: DataFrame,
    train_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Witten-Bell bigram scoring (Witten & Bell, IEEE
    Trans. IT 1991, "method C" — the escape-probability smoothing PPM
    compressors and SRILM's ``-wbdiscount`` ship):

        P_WB(w|v) = (c(vw) + T(v) * P_uni(w)) / (c(v.) + T(v))

    where ``T(v) = N1+(v.)`` is the number of DISTINCT continuations of
    context v — the "how often does v precede something new" escape
    estimate — and the unigram fallback is the add-one model
    ``P_uni(w) = (c(w)+1)/(N+V)`` (the :func:`unigram_lm` contract, so
    OOV words keep a positive floor).  An UNSEEN context scores
    ``P_uni(w)`` alone.  Completes the smoothing ladder next to add-one
    (q66), stupid backoff (q75), Dirichlet (q216), Good-Turing (q217),
    and Kneser-Ney (q226).

    Determinism contract: the kneser_ney micro-unit recipe — per-bigram
    ``lp_micro = round(ln(P)*1e6)`` quantizes to int64 BEFORE any
    cross-row sum; doc totals are exact integer sums, the mean one
    final division rounded to 6.

    Scale shape (100 TB): same as :func:`kneser_ney_doc_scores` — three
    map-side-combined count aggregates over the training corpus,
    per-doc distinct-bigram reduction, replication-free hash joins on
    unique keys, scalars on a 1-row broadcast.  No collect, no Python,
    no window.

    Returns (id, n_bigrams, wb_sum_micro, wb_mean); docs with < 2
    tokens get (0, 0, NULL)."""
    bi = (
        _bigram_rows(train_df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.sum("k").cast("long").alias("c12"))
    )
    ctx = bi.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("t_v"),
    )
    uni = (
        _tok_rows(train_df, id_col, text_col)
        .groupBy("tok")
        .agg(F.sum("k").cast("long").alias("cw"))
    )
    scal = uni.agg(
        F.sum("cw").cast("long").alias("n_tot"),
        F.count(F.lit(1)).cast("long").alias("v_size"),
    )
    doc_bi = _bigram_rows(df, id_col, text_col)
    p_uni = (F.coalesce(F.col("cw"), F.lit(0)) + 1.0) / (
        F.col("n_tot") + F.col("v_size")
    )
    p = F.when(
        F.col("c1").isNotNull(),
        (F.coalesce(F.col("c12"), F.lit(0)) + F.col("t_v") * p_uni)
        / (F.col("c1") + F.col("t_v")),
    ).otherwise(p_uni)
    scored = (
        doc_bi.join(bi, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(uni.withColumnRenamed("tok", "w2"), "w2", "left")
        .crossJoin(F.broadcast(scal))
        .withColumn("lp_micro", F.round(F.log(p) * 1e6, 0).cast("long"))
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("lp_micro")).cast("long").alias(
                "wb_sum_micro"
            ),
        )
        .withColumn(
            "wb_mean",
            F.round(F.col("wb_sum_micro") / 1e6 / F.col("n_bigrams"), 6),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("wb_sum_micro", F.lit(0)).cast("long").alias(
                "wb_sum_micro"
            ),
            "wb_mean",
        )
    )


def ccnet_tertiles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's per-language perplexity bucketing (Wenzek et al., LREC
    2020 §4.3: score each document with a language-matched LM, split
    each language into equal head/middle/tail thirds by perplexity —
    the head slice is what most LM pretraining corpora actually keep).
    Per language, an add-one unigram LM is trained on that language's
    own slice (the in-language proxy for CCNet's Wikipedia-trained
    KenLM); each doc scores its mean token log-probability against its
    OWN language's model and buckets by ``ntile(n_buckets)`` ordered by
    (score DESC, id) — head = likelier text.  Token-less docs rank last
    within their language (NULL score, pinned NULLS LAST via the id
    tie-break ordering both engines share).

    Scale shape (100 TB): the per-language LM is ONE (lang, tok)
    map-side-combined rollup — languages never collide; scoring joins
    per-doc distinct tokens on the composite (lang, tok) key
    (replication-free); the ntile window partitions BY LANGUAGE — ~100
    partitions of corpus/100 docs each, the one genuinely per-language
    global sort this semantics requires (CCNet's tertile boundaries are
    corpus-order statistics; no cheaper shape computes them exactly).

    Returns (id, lang, n_tokens, lm_score, bucket, label) with label in
    head/middle/tail (bucket number for n_buckets != 3)."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lang"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    doc_toks = toks.groupBy("id", "lang", "tok").agg(
        F.count("*").cast("long").alias("k")
    )
    lm = toks.groupBy("lang", "tok").agg(
        F.count("*").cast("long").alias("cnt")
    )
    scal = lm.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("n_tot"),
        F.count(F.lit(1)).cast("long").alias("v_size"),
    )
    scored = (
        doc_toks.join(lm, ["lang", "tok"])
        .join(scal, "lang")
        .withColumn(
            "lp",
            F.log(
                (F.col("cnt") + 1.0) / (F.col("n_tot") + F.col("v_size"))
            ),
        )
        .groupBy("id", "lang")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("lp") * F.col("k")) / F.sum("k"), 6).alias(
                "lm_score"
            ),
        )
    )
    base = (
        df.select(F.col(id_col).alias("id"), F.col(lang_col).alias("lang"))
        .join(scored.drop("lang"), "id", "left")
        .select(
            "id",
            "lang",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "lm_score",
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("lm_score").desc_nulls_last(), F.col("id")
    )
    out = base.withColumn("bucket", F.ntile(n_buckets).over(w).cast("int"))
    label = (
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == 2, "middle")
        .otherwise("tail")
        if n_buckets == 3
        else F.col("bucket").cast("string")
    )
    return out.withColumn("label", label)
