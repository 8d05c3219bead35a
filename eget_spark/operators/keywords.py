"""Graph-based keyword extraction: TextRank (Mihalcea & Tarau, EMNLP
2004) over per-document word co-occurrence graphs — the classic
unsupervised keyword tagger a training-data pipeline runs to label web
documents with topic terms (for mixing, dedup explanations, and search
over the corpus) without any model.

The whole corpus is ONE keyed dataflow: the vertex key is (doc, word),
so every doc's graph iterates simultaneously in the same five jobs —
there is no per-document loop, no driver involvement, and hot words
cannot skew a shuffle because the key always includes the doc id.

Semantics (pinned):
- tokens: the q66 tokenizer (``lower``, split on ``[^a-z0-9]+``);
- edges: ADJACENT token pairs (co-occurrence window 2, the TextRank
  paper's default for keyword extraction), undirected, de-duplicated
  per doc, self-pairs dropped; words that never sit next to a different
  word have no vertex (and docs with < 2 distinct adjacent words have
  no keywords);
- score: the paper's absolute-teleport recurrence
  ``WS(v) = (1-d) + d * sum_{u~v} WS(u)/deg(u)`` with d = 17/20, run
  ``n_iter`` PINNED rounds from WS = 1;
- arithmetic: int64 units of 1/scale with truncating ``div`` — the
  :func:`eget_spark.operators.graph.pagerank_fixed` discipline, so the
  trajectory is bit-exact across engines, partitionings, and summation
  orders (float rounding cannot pin grid-value/small-degree ties).

Scale shape (100 TB): per iteration ONE hash join of the symmetric
edge list against the rank table on (doc, word) + ONE map-side-combined
sum — uniform keys, no window until the final top-k (per-doc window,
bounded partitions).  Ranks localCheckpoint per iteration so lineage
stays O(1).  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eget_spark.operators.lm_score import TOKEN_SPLIT


def textrank_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_iter: int = 5,
    k: int = 3,
    damp_num: int = 17,
    damp_den: int = 20,
    scale: int = 10**12,
) -> DataFrame:
    """Top-``k`` TextRank keywords per document: (id, word, rank_fp,
    kw_rank) with rank_fp the int64 fixed-point score and kw_rank 1..k
    by (rank_fp DESC, word)."""
    arr = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
            lambda t: t != F.lit(""),
        ).alias("ts"),
    )
    # adjacent pairs: zip ts[0:n-1] with ts[1:n]
    pairs = arr.select(
        "id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.expr("slice(ts, 2, greatest(size(ts) - 1, 0))"),
                lambda a, b: F.struct(
                    F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
                ),
            )
        ).alias("p"),
    )
    und = (
        pairs.select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(
        "id", F.col("a").alias("v"), F.col("b").alias("u")
    ).unionAll(und.select("id", F.col("b").alias("v"), F.col("a").alias("u")))
    deg = sym.groupBy("id", "v").agg(
        F.count("*").cast("long").alias("deg")
    )
    nodes = deg.select("id", F.col("v").alias("w")).localCheckpoint()
    contrib_src = (
        sym.join(
            deg.select("id", F.col("v").alias("u"), "deg"), ["id", "u"]
        ).localCheckpoint()
    )  # (id, v, u, deg_u): the static message topology
    base = (scale * (damp_den - damp_num)) // damp_den
    ranks = nodes.withColumn(
        "r", F.lit(scale).cast("long")
    ).localCheckpoint()
    for _ in range(n_iter):
        msgs = (
            contrib_src.join(
                ranks.select("id", F.col("w").alias("u"), "r"), ["id", "u"]
            )
            .select("id", "v", F.expr("r div deg").alias("c"))
            .groupBy("id", "v")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        ranks = (
            nodes.join(
                msgs.select("id", F.col("v").alias("w"), "s"), ["id", "w"], "left"
            )
            .select(
                "id",
                "w",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damp_num} * coalesce(s, 0)) div {damp_den}"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    win = Window.partitionBy("id").orderBy(F.col("r").desc(), "w")
    return (
        ranks.withColumn("kw_rank", F.row_number().over(win))
        .where(F.col("kw_rank") <= k)
        .select(
            "id",
            F.col("w").alias("word"),
            F.col("r").alias("rank_fp"),
            F.col("kw_rank").cast("int"),
        )
    )
