"""Linear text-quality classifier scoring: broadcast vocab-weight model.

Training-data-pipeline extension (no single reference operator): the
model-based quality filter of the CCNet / GPT-3 / Gopher pipelines — a
linear classifier over bag-of-words features separates "reference-like"
pages from raw crawl text, and only pages above a score threshold enter
the training mix.  The real pipelines use a fastText or logistic model;
the ENGINE-side contract is identical regardless of where the weights
came from: score every document with a (token -> weight) linear model
shipped to the executors, entirely in integer fixed-point so a SQL
oracle reproduces every score bit-for-bit.

Pinned semantics (engine-exact, integer-only):

- tokens = lowercase ``text`` split on ``[^a-z0-9]+`` (the repo-standard
  tokenizer — functions/text.py), empty tokens dropped;
- ``score_fp = bias_fp + sum(tf(token) * weight_fp[token])`` over the
  vocab tokens present in the doc (term FREQUENCY, not presence — a page
  repeating "casino" 50x scores 50 weights, the usual bow behavior);
- ``kept = score_fp >= threshold_fp`` (default 0).

Scale shape (100 TB): the weight table is a |vocab|-row BROADCAST — the
corpus explodes to (doc, token) once, inner-joins the broadcast vocab
(non-vocab tokens never survive the join, so the shuffled volume is
vocab hits only), then one map-side-combined groupBy(doc) partial_sum.
Docs with zero vocab hits are restored by a left join back onto the id
spine (score = bias alone).  No window, no Python, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def linear_text_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights_fp: dict[str, int],
    bias_fp: int = 0,
    threshold_fp: int = 0,
) -> DataFrame:
    """(id, n_hits, score_fp, kept): integer linear bow score per doc.

    ``weights_fp`` maps token -> int64 fixed-point weight (caller picks
    the scale; 1e-6 units by repo convention).  ``n_hits`` counts vocab
    token OCCURRENCES (sum of tfs), 0 for docs with no vocab token.
    """
    spark = df.sparkSession
    vocab = F.broadcast(
        spark.createDataFrame(
            sorted(weights_fp.items()), "tok string, w_fp long"
        )
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    hit = (
        toks.join(vocab, "tok")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.sum("w_fp").cast("long").alias("_wsum"),
        )
    )
    spine = df.select(F.col(id_col).alias("id")).distinct()
    scored = spine.join(hit, "id", "left").select(
        "id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce("_wsum", F.lit(0)) + F.lit(int(bias_fp)))
        .cast("long")
        .alias("score_fp"),
    )
    return scored.withColumn(
        "kept", F.col("score_fp") >= F.lit(int(threshold_fp))
    )


def classifier_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    weights_fp: dict[str, int],
    bias_fp: int = 0,
    threshold_fp: int = 0,
) -> str:
    """DuckDB SQL computing the identical scores (oracle generator)."""
    vocab_rows = ", ".join(
        f"('{t}', {int(w)})" for t, w in sorted(weights_fp.items())
    )
    return f"""
WITH vocab(tok, w_fp) AS (VALUES {vocab_rows}),
toks AS (
  SELECT {id_col} AS id,
         unnest(list_filter(
           regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_RE}'),
           t -> t <> '')) AS tok
  FROM {table}
),
hit AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_hits,
         CAST(sum(w_fp) AS BIGINT) AS wsum
  FROM toks JOIN vocab USING (tok) GROUP BY id
)
SELECT d.id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.wsum, 0) + {int(bias_fp)} AS BIGINT) AS score_fp,
       coalesce(h.wsum, 0) + {int(bias_fp)} >= {int(threshold_fp)} AS kept
FROM (SELECT DISTINCT {id_col} AS id FROM {table}) d
LEFT JOIN hit h USING (id)
"""
