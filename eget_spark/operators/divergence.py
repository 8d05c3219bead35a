"""Per-group unigram-distribution divergence from the corpus mixture.

Data-selection and mixture-tuning pipelines measure how far each source
domain's word distribution sits from the corpus average — the KL term in
importance-sampling selection (Moore & Lewis 2010 use the cross-entropy
difference; DSIR, Xie et al. 2023, importance-weights against a target
distribution; DoReMi, Xia et al. 2023, reweights domains by excess
loss).  This operator computes, per group (source/lang/host), the
information-theoretic primitives those recipes are built from:

- ``h_micro``  = Shannon entropy of the group's unigram distribution,
  ``-sum p ln p``
- ``ce_micro`` = cross-entropy of the group under the CORPUS unigram
  distribution, ``-sum p ln q``
- ``kl_micro`` = ``KL(P_group || P_corpus) = sum p ln(p/q)``

A group whose text is "just like the corpus" has kl near 0; boilerplate
farms, non-prose sources, and off-domain feeds stand out with large KL.

Pinned semantics (so the DuckDB oracle reproduces them exactly):
tokens = lowercased runs split on ``[^a-z0-9]+`` (the engine-wide pin);
``p = n_gt / N_g`` (token share within the group), ``q = n_t / N``
(share in the whole corpus — never zero for a token the group contains);
every per-token term is int64 MICRO-quantized BEFORE the sum (the q244
discipline: integer sums are reduction-order independent, so the result
is bit-identical across partitionings and engines); each of the three
statistics is its own quantized sum — kl_micro is NOT derived as
``ce - h``.

Scale shape (100 TB): one explode -> groupBy(group, token) count with
map-side partial combine (hot tokens collapse per map task); the corpus
margin is a groupBy OF that table (already one row per (group, token));
group totals broadcast (group cardinality is small by construction —
sources, languages); the corpus-total scalar rides a 1-row broadcast.
The only join keyed on token hits a unique-key vocabulary table —
replication-free, AQE splits residual hot-token skew.  No driver loops,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eget_spark.operators.lm_score import TOKEN_SPLIT


def group_divergences(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(group, n_toks, n_types, h_micro, ce_micro, kl_micro), one row
    per group, ordered by group."""
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    gt = toks.groupBy("grp", "tok").agg(F.count("*").cast("long").alias("n_gt"))
    g_tot = gt.groupBy("grp").agg(F.sum("n_gt").cast("long").alias("n_g"))
    vocab = gt.groupBy("tok").agg(F.sum("n_gt").cast("long").alias("n_t"))
    tot = vocab.agg(F.sum("n_t").cast("long").alias("n"))

    p = F.col("n_gt").cast("double") / F.col("n_g").cast("double")
    q = F.col("n_t").cast("double") / F.col("n").cast("double")
    micro = lambda c: F.round(c * 1e6).cast("long")
    terms = (
        gt.join(F.broadcast(g_tot), "grp")
        .join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "n_gt",
            micro(-p * F.log(p)).alias("h_term"),
            micro(-p * F.log(q)).alias("ce_term"),
            micro(p * F.log(p / q)).alias("kl_term"),
        )
    )
    return (
        terms.groupBy("grp")
        .agg(
            F.sum("n_gt").cast("long").alias("n_toks"),
            F.count("*").cast("long").alias("n_types"),
            F.sum("h_term").cast("long").alias("h_micro"),
            F.sum("ce_term").cast("long").alias("ce_micro"),
            F.sum("kl_term").cast("long").alias("kl_micro"),
        )
        .withColumnRenamed("grp", group_col)
        .orderBy(group_col)
    )


LN2_MICRO = 693147  # round(ln(2) * 1e6)


def pairwise_jsd(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between group unigram
    distributions (Lin, IEEE-IT 1991) — the symmetric, ln(2)-bounded
    complement to :func:`group_divergences`' KL-vs-corpus: which SOURCES
    resemble EACH OTHER, the matrix behind mixture dedup ("these two
    feeds are the same corpus twice") and domain-balancing decisions.

    JSD(P,Q) = (KL(P||M) + KL(Q||M))/2 with M = (P+Q)/2.  Tokens only
    one side contains contribute exactly p*ln(2)/2 (since m = p/2), so
    the computation splits into a SHARED-token term and two closed-form
    residuals — no full-outer join over the union vocabulary:

    - shared term, per (pair, token): round(1e6 * (p*ln(2p/(p+q))
      + q*ln(2q/(p+q))) / 2) — int64 micro-nats quantized BEFORE the
      sum (the q244/q249 discipline)
    - residual_a = (n_a - shared_a) * LN2_MICRO DIV (2 * n_a) — exact
      integers (shared_a = group-a tokens that also occur in b)
    - jsd_micro = shared_sum + residual_a + residual_b, in [0,
      LN2_MICRO]; disjoint-vocabulary pairs hit the ln(2) ceiling
      exactly (up to the two DIV floors)

    Scale shape (100 TB): the (group, token) table is ONE map-side-
    combined explode aggregate; the pair term joins it to itself on the
    token key — per-token fan-out is (groups containing it choose 2),
    bounded by the group count, which is small by construction
    (sources/langs); group totals ride broadcasts; the pair spine is a
    |groups|^2/2 broadcast-class cross join so pairs with zero shared
    vocabulary still appear.  No windows, no Python.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    gt = toks.groupBy("grp", "tok").agg(
        F.count("*").cast("long").alias("n_gt")
    )
    g_tot = gt.groupBy("grp").agg(F.sum("n_gt").cast("long").alias("n_g"))

    a = gt.select(
        F.col("grp").alias("ga"), F.col("tok"), F.col("n_gt").alias("ca")
    )
    b = gt.select(
        F.col("grp").alias("gb"), F.col("tok"), F.col("n_gt").alias("cb")
    )
    ta = g_tot.select(F.col("grp").alias("ga"), F.col("n_g").alias("na"))
    tb = g_tot.select(F.col("grp").alias("gb"), F.col("n_g").alias("nb"))
    p = F.col("ca").cast("double") / F.col("na").cast("double")
    q = F.col("cb").cast("double") / F.col("nb").cast("double")
    shared = (
        a.join(b, "tok")
        .where(F.col("ga") < F.col("gb"))
        .join(F.broadcast(ta), "ga")
        .join(F.broadcast(tb), "gb")
        .select(
            "ga",
            "gb",
            "ca",
            "cb",
            F.round(
                (
                    p * F.log(2.0 * p / (p + q))
                    + q * F.log(2.0 * q / (p + q))
                )
                / 2.0
                * 1e6
            )
            .cast("long")
            .alias("t_micro"),
        )
        .groupBy("ga", "gb")
        .agg(
            F.count("*").cast("long").alias("n_shared_types"),
            F.sum("ca").cast("long").alias("sa"),
            F.sum("cb").cast("long").alias("sb"),
            F.sum("t_micro").cast("long").alias("shared_micro"),
        )
    )
    spine = (
        ta.crossJoin(tb)
        .where(F.col("ga") < F.col("gb"))
    )
    return (
        spine.join(shared, ["ga", "gb"], "left")
        .select(
            F.col("ga").alias("grp_a"),
            F.col("gb").alias("grp_b"),
            F.coalesce("n_shared_types", F.lit(0))
            .cast("long")
            .alias("n_shared_types"),
            (
                F.coalesce("shared_micro", F.lit(0))
                + F.expr(
                    f"(na - coalesce(sa, 0)) * CAST({LN2_MICRO} AS BIGINT)"
                    " DIV (2 * na)"
                )
                + F.expr(
                    f"(nb - coalesce(sb, 0)) * CAST({LN2_MICRO} AS BIGINT)"
                    " DIV (2 * nb)"
                )
            )
            .cast("long")
            .alias("jsd_micro"),
        )
        .orderBy("grp_a", "grp_b")
    )
