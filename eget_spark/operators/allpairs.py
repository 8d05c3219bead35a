"""All-pairs document similarity via an inverted-index self-join.

The classic batch formulation (Bayardo, Ma, Srikant, "Scaling Up All
Pairs Similarity Search", WWW 2007; Lin, "Brute force and indexed
approaches to pairwise document similarity", SIGIR 2009 — public
papers): build term postings, self-join postings on the term, and
aggregate per document pair.  The reference engine has no such
operator; this is part of the LLM-training-data toolbox (near-dup
discovery with an exact score, unlike the MinHash/SimHash candidate
generators in operators/dedup.py which approximate Jaccard/Hamming).

Exact semantics (pinned so the DuckDB oracle reproduces them):

- tokens: ``split(lower(text), '[^a-z0-9]+')`` minus empties — the
  engine-wide TOKEN_SPLIT contract (operators/lm_score.py:41);
- term weight: raw in-document term frequency ``tf`` (an integer).
  Deliberately NOT tf-idf: ``ln`` is the one libm call whose rounding
  differs across engines (see q43's recipe), while integer tf keeps
  every sum exact in IEEE doubles, so Spark and DuckDB agree
  bit-for-bit.  The idf role — damping ubiquitous terms — is played
  structurally by the ``max_df`` prune below, which a scale-out
  implementation needs anyway;
- vocabulary prune: terms with corpus document frequency ``df < 2``
  (can't contribute to any pair) or ``df > max_df`` (stop-terms) are
  dropped BEFORE norms are computed, i.e. cosine is taken over the
  pruned vocabulary for both the dot product and the norms — the
  operator is self-consistent, not an approximation of an unpruned
  cosine;
- ``cos(a,b) = dot / (sqrt(n2_a) * sqrt(n2_b))`` where
  ``dot = sum(tf_a*tf_b)`` and ``n2 = sum(tf^2)`` are exact integer
  sums; the sqrt/mul/div tail is one correctly-rounded IEEE op each,
  so both engines produce identical doubles and the ``min_cos``
  predicate evaluates identically — no rounding fudge needed;
- output: (id_a, id_b, dot, cos) with id_a < id_b, cos >= min_cos.

Scale shape (the 100 TB story): the quadratic risk in any all-pairs
job is a hot posting list — a term in 10^7 documents yields 10^14
candidate pairs on one join key.  ``max_df`` bounds per-term fan-out
to max_df^2 BEFORE the join (a groupBy(term) count with map-side
partial combine, then a semi filter), so every join key carries at
most ``max_df`` rows a side; the pair aggregate is a HashAggregate
with map-side combine on (id_a, id_b).  Three uniform shuffles total
(term df, postings join, pair agg); norms are a per-document
aggregate joined back by id (uniform).  No window over the term
column, no distinct over emitted pairs, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm_score import TOKEN_SPLIT


def tf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 100,
    min_cos: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, dot, cos) for every document pair whose tf-cosine
    over the df-pruned vocabulary is >= ``min_cos``; id_a < id_b."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    # (id, term, tf): map-side-combined; one uniform shuffle on (id, term).
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # prune by corpus df BEFORE norms: df<2 never pairs, df>max_df is a
    # stop-term whose posting list would fan out quadratically.
    kept_terms = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= F.lit(max_df)))
        .select("term")
    )
    # semi-join membership filter; NOT a forced broadcast — the kept
    # vocabulary at corpus scale can itself be huge (every 2..max_df-df
    # term), so the planner/AQE picks broadcast only when it fits.
    post = tf.join(kept_terms, "term", "semi")
    norms = post.groupBy("id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    a = post.select(
        F.col("term"), F.col("id").alias("id_a"), F.col("tf").alias("tf_a")
    )
    b = post.select(
        F.col("term"), F.col("id").alias("id_b"), F.col("tf").alias("tf_b")
    )
    pairs = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("n2").alias("n2_b"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "dot",
            (
                F.col("dot")
                / (F.sqrt(F.col("n2_a").cast("double")) * F.sqrt(F.col("n2_b").cast("double")))
            ).alias("cos"),
        )
        .where(F.col("cos") >= F.lit(float(min_cos)))
    )
