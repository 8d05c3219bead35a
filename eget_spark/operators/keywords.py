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


RAKE_STOPWORDS = [
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on", "at",
    "for", "with", "by", "from", "as", "is", "are", "was", "were", "be",
    "been", "it", "its", "this", "that", "these", "those", "he", "she",
    "they", "we", "you", "i", "not", "no", "do", "does", "did", "have",
    "has", "had", "will", "would", "can", "could", "their", "his", "her",
]  # = functions/text._STOPWORDS (the q39 quality-signal list), pinned


def rake_phrases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010,
    "Automatic keyword extraction from individual documents" — the
    stopword-delimited companion to q240's TextRank: RAKE finds multi-
    word PHRASES, TextRank single terms).

    Pinned semantics:
    - candidate phrases = maximal runs of non-stopwords, broken at
      punctuation fragments (``[^a-z0-9\\s]+`` on the lowercased text)
      and at :data:`RAKE_STOPWORDS`; no length cap (the paper's
      original, uncapped);
    - per-document word stats over ALL phrase occurrences:
      ``freq(w)`` = occurrences, ``deg(w)`` = sum of the lengths of the
      phrases containing each occurrence;
    - word score in int64 micro-units: ``(deg * 1e6) div freq`` —
      integer, so the phrase score (sum of member word scores WITH
      multiplicity) is an exact integer sum, bit-stable across engines
      and orders (the q226 discipline applied to RAKE's ratio);
    - ranking: DISTINCT phrase texts per doc by (score DESC, phrase),
      top ``k``.

    Scale shape (100 TB): two exploded projections (fragments, tokens),
    one per-fragment window for the phrase ids (partition key includes
    the fragment — bounded partitions), two map-side-combined groupBys
    (phrase assembly, word stats), one broadcast-size-per-doc join of
    members against word scores, and the final per-doc top-k window.
    No Python anywhere.

    Returns (id, phrase, score_micro, kw_rank)."""
    frags = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9\s]+")
        ).alias("fidx", "frag"),
    )
    toks = frags.select(
        "id",
        "fidx",
        F.posexplode(
            F.filter(F.split(F.col("frag"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("pos", "w"),
    ).withColumn("is_stop", F.col("w").isin(*RAKE_STOPWORDS))
    w_cum = Window.partitionBy("id", "fidx").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = toks.withColumn(
        "phrase_id", F.sum(F.col("is_stop").cast("int")).over(w_cum)
    ).where(~F.col("is_stop"))
    occurrences = marked.groupBy("id", "fidx", "phrase_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "w"))),
            lambda s: s["w"],
        ).alias("words")
    )
    word_stats = (
        occurrences.select(
            "id", F.size("words").alias("plen"), F.explode("words").alias("w")
        )
        .groupBy("id", "w")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .withColumn("wscore", F.expr("(deg * 1000000) div freq"))
    )
    scored = (
        occurrences.select(
            "id",
            F.concat_ws(" ", "words").alias("phrase"),
            F.explode("words").alias("w"),
        )
        .join(word_stats.select("id", "w", "wscore"), ["id", "w"])
        .groupBy("id", "phrase")
        .agg(F.sum("wscore").cast("long").alias("_raw"))
    )
    # identical phrase text => identical members => identical score, so
    # the (id, phrase) sum counts the true member sum n_occ times —
    # divide back exactly (integer: _raw is a multiple of the score)
    per_occ = (
        occurrences.select(
            "id", F.concat_ws(" ", "words").alias("phrase")
        )
        .groupBy("id", "phrase")
        .agg(F.count("*").cast("long").alias("n_occ"))
    )
    dedup = (
        scored.join(per_occ, ["id", "phrase"])
        .select(
            "id",
            "phrase",
            F.expr("_raw div n_occ").cast("long").alias("score_micro"),
        )
    )
    win = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), "phrase"
    )
    return (
        dedup.withColumn("kw_rank", F.row_number().over(win))
        .where(F.col("kw_rank") <= k)
        .select("id", "phrase", "score_micro", F.col("kw_rank").cast("int"))
    )
