"""DSIR: Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023 — the public method behind "pick the crawl slice that looks
like the target domain" in modern LM data pipelines).

Both corpora are reduced to HASHED N-GRAM bucket distributions (the
paper's §3.2 hashed feature space: unigrams + bigrams hashed into B
buckets — collisions are part of the estimator, not a bug), each bucket
add-1 smoothed, and every raw document gets the log importance weight

    log w(x) = sum over features f of x:  ln p_target(b(f)) - ln p_raw(b(f))

The paper then Gumbel-top-k samples by these weights; the deterministic
engine exposes the weights themselves (callers rank or threshold — the
repo-wide no-hidden-randomness contract; hash-salted sampling lives in
operators/sampling.py).

Pinned cross-engine semantics: features = the q66/q75 token contract
(lowercased ``[^a-z0-9]+`` splits, empty dropped) plus space-joined
bigrams of the same tokens (bigrams contain a space, so the two feature
kinds cannot collide as strings); bucket = repo-standard md5-60bit of
``'ds:' || feature`` mod B; per-bucket log ratio
``ln((c_t+1)/(T+B)) - ln((c_r+1)/(R+B))`` with ln the only non-exact op,
and the final weight rounded to 6 (the repo ulp recipe).

Scale shape (100 TB): per-corpus bucket counts are ONE map-side-combined
aggregation each over at most B distinct keys (hot features collapse per
task — Zipf-proof); the per-bucket log-ratio table is B rows and rides a
BROADCAST into the per-doc rollup, so the raw corpus shuffles once on
(id, bucket) and never on a vocabulary-sized key.  No window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmv import md5_60bit
from .lm_score import TOKEN_SPLIT, _bigram_arr


def _feature_rows(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket, k): hashed unigram+bigram feature counts per doc."""
    uni = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("feat"),
    )
    bi = df.select(
        F.col(id_col).alias("id"),
        F.explode(_bigram_arr(text_col)).alias("feat"),
    )
    feats = uni.unionByName(bi)
    bucket = F.pmod(
        md5_60bit(F.concat(F.lit("ds:"), F.col("feat"))), F.lit(n_buckets)
    ).cast("long")
    return (
        feats.select("id", bucket.alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("long").alias("k"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-raw-document DSIR log importance weights against ``target``.

    Returns (id, n_feats, dsir_logw) — n_feats counts the doc's feature
    occurrences (unigrams + bigrams), dsir_logw the summed bucket log
    ratio rounded to 6; docs with no features keep n_feats = 0 and a
    NULL weight (nothing to resample on)."""
    spark = raw.sparkSession
    fr = _feature_rows(raw, id_col, text_col, n_buckets)
    ft = _feature_rows(target, id_col, text_col, n_buckets)
    cr = fr.groupBy("bucket").agg(F.sum("k").cast("long").alias("c_r"))
    ct = ft.groupBy("bucket").agg(F.sum("k").cast("long").alias("c_t"))
    scalars = (
        fr.agg(F.sum("k").cast("long").alias("_R"))
        .crossJoin(ft.agg(F.sum("k").cast("long").alias("_T")))
    )
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    lr = (
        buckets.join(ct, "bucket", "left")
        .join(cr, "bucket", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("c_t", F.lit(0)) + 1)
                    / (F.col("_T") + n_buckets)
                )
                - F.log(
                    (F.coalesce("c_r", F.lit(0)) + 1)
                    / (F.col("_R") + n_buckets)
                )
            ).alias("lr"),
        )
    )
    scored = (
        fr.join(F.broadcast(lr), "bucket")
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("k") * F.col("lr")), 6).alias("dsir_logw"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            "dsir_logw",
        )
    )
