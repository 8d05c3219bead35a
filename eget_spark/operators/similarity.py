"""Similarity search over an embedding column (array<float>).

- `cosine_topk_bruteforce`: the exact baseline — cross-score query vectors
  against the corpus with higher-order fns (zip_with dot product in
  float64), rank per query. O(|Q|·n), fully JVM-side, shuffle-light
  (broadcast the query side).
- `ivf_topk`: the scale path — IVF-style coarse quantization: centroids per
  cluster (here the table's cluster/label column or k-means-lite seeded
  assignment), probe the `nprobe` nearest centroids per query, score only
  those cells. At 100 TB the cell assignment is the partition key, so each
  query touches nprobe partitions instead of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self). Returns
    (query_id, neighbor_id, cosine, rank). Query side broadcast."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def centroids(
    corpus: DataFrame, cell_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Per-cell mean vector via posexplode + groupBy(cell, dim) — pure
    DataFrame, no Python. Returns (cell, centroid:array<double>)."""
    dims = (
        corpus.select(
            F.col(cell_col).alias("cell"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
        )
        .groupBy("cell", "dim")
        .agg(F.avg("x").alias("m"))
    )
    return (
        dims.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select("cell", F.transform("dm", lambda s: s["m"]).alias("centroid"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN: route each query to its nprobe nearest cell centroids, then
    exact-score only those cells. Returns (query_id, neighbor_id, cosine,
    rank) — approximate (recall < 1) by construction."""
    cents = centroids(corpus, cell_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    routed = (
        q.join(F.broadcast(cents))
        .select(
            "query_id", "qv", "cell",
            cosine(F.col("qv"), F.col("centroid")).alias("cc"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("cc").desc(), F.col("cell"))
            ),
        )
        .where(F.col("crank") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    c = corpus.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = c.join(F.broadcast(routed), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def rocchio_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fb_k: int = 10,
    alpha_ppm: int = 1_000_000,
    beta_ppm: int = 750_000,
    k: int = 10,
) -> DataFrame:
    """Rocchio pseudo-relevance feedback in vector space (Rocchio 1971,
    the SMART system's relevance-feedback formula; Manning et al. IIR
    §9.1.1) — the embedding-side twin of the lexical RM3 operator
    (operators/search.rm3_topk): the query vector moves toward the
    centroid of its top-``fb_k`` initial neighbors,

        q' = alpha * q + (beta / |Dr|) * sum_{d in Dr} d

    then the corpus is re-ranked by cosine to q'.  (gamma = 0, the
    standard pseudo-feedback setting — without real negative judgments
    the negative centroid term is noise.)

    Determinism contract: the modified query is built in EXACT int64
    micro-units — every component quantizes to ``round(x * 1e6)``
    BEFORE any cross-row sum, the feedback centroid stays an integer
    SUM (the 1/|Dr| normalization is absorbed by scaling the alpha term
    with |Dr|, which leaves the cosine direction unchanged):

        q2_fp[d] = alpha_ppm * |Dr| * round(q[d]*1e6)
                 + beta_ppm * sum_r round(r[d]*1e6)

    so q' is bit-identical across engines and partitionings; only the
    final cosine touches floats (rounded to 6, ties by neighbor id —
    the q17 recipe).  The initial feedback ranking reuses
    :func:`cosine_topk_bruteforce`'s round-6 + id-tie contract.

    Scale shape (100 TB): the query side broadcasts twice (initial scan
    + re-rank scan, each one pass over the corpus — the brute-force
    baseline; route through :func:`ivf_topk` cells for the indexed
    path); feedback vectors reduce by (query, dim) map-side-combined
    integer sums (fb_k * dim rows per query — tiny), and q' reassembles
    with the array_sort(collect_list(struct)) idiom before
    broadcasting back.  No Python, no driver rows.

    Returns (query_id, neighbor_id, cosine, rank) — rank 1..k per
    query, self excluded."""
    fb = cosine_topk_bruteforce(corpus, queries, id_col, vec_col, k=fb_k)
    c_fp = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * 1e6, 0).cast("long"),
        ).alias("cv_fp"),
    )
    rel_dims = (
        fb.select("query_id", "neighbor_id")
        .join(c_fp, "neighbor_id")
        .select("query_id", F.posexplode("cv_fp").alias("dim", "x"))
        .groupBy("query_id", "dim")
        .agg(F.sum("x").cast("long").alias("srel"))
    )
    n_rel = fb.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_rel")
    )
    q_dims = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            F.transform(
                F.col(vec_col).cast("array<double>"),
                lambda x: F.round(x * 1e6, 0).cast("long"),
            )
        ).alias("dim", "vq"),
    )
    q2 = (
        q_dims.join(rel_dims, ["query_id", "dim"], "left")
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            "dim",
            (
                alpha_ppm * F.coalesce(F.col("n_rel"), F.lit(1)) * F.col("vq")
                + beta_ppm * F.coalesce(F.col("srel"), F.lit(0))
            ).cast("long").alias("q2"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "q2"))),
                lambda s: s["q2"].cast("double"),
            ).alias("q2v")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = c.join(
        F.broadcast(q2), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q2v"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def mmr_rerank(
    corpus: DataFrame,
    query_vec: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_candidates: int = 20,
    k: int = 5,
    lambda_ppm: int = 500_000,
) -> DataFrame:
    """Maximal Marginal Relevance diversified selection (Carbonell &
    Goldstein, SIGIR 1998 — the classic redundancy-penalized reranker;
    in a training-data pipeline it picks a relevant-but-diverse exemplar
    subset where plain top-k returns near-duplicates).  Greedy: from
    the top ``n_candidates`` initial neighbors of the query, repeatedly
    select

        argmax_d  lam * sim(d, q) - (1 - lam) * max_{s in S} sim(d, s)

    until k are chosen (ties by id; the first pick has no diversity
    term, so it is simply the nearest neighbor).

    Pinned determinism: both similarity matrices (candidate-query and
    candidate-candidate) are cosines rounded to 6 (the q17 recipe);
    the MMR objective is a single exactly-rounded float expression over
    those pinned inputs with ``lam = lambda_ppm/1e6``, compared with an
    id tie-break — engine-identical.

    Scale shape (100 TB): one corpus scan finds the candidates
    (broadcast query, TakeOrdered n_candidates); everything after
    operates on the n_candidates x n_candidates pairwise matrix —
    driver-bounded small (the greedy loop is k Spark jobs over <= n^2
    rows, each a localCheckpoint'd 1-row argmax; no corpus-size data
    ever enters the loop).  The loop count k is a Python constant, so
    the plan depth is bounded and static.

    Returns (sel_rank, id, relevance, mmr_score) — sel_rank 1..k in
    selection order; the first row's mmr_score equals its relevance."""
    lam = lambda_ppm / 1e6
    q = query_vec.select(
        F.col(vec_col).cast("array<double>").alias("qv")
    ).limit(1)
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    cand = (
        c.crossJoin(F.broadcast(q))
        .select(
            "id", "cv", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("rel")
        )
        .orderBy(F.col("rel").desc(), F.col("id"))
        .limit(n_candidates)
        .localCheckpoint()
    )
    pair = (
        cand.select(F.col("id").alias("a"), F.col("cv").alias("av"))
        .join(
            F.broadcast(
                cand.select(F.col("id").alias("b"), F.col("cv").alias("bv"))
            ),
            F.col("a") != F.col("b"),
        )
        .select(
            "a", "b", F.round(cosine(F.col("av"), F.col("bv")), 6).alias("sim")
        )
        .localCheckpoint()
    )
    selected = (
        cand.orderBy(F.col("rel").desc(), F.col("id"))
        .limit(1)
        .select(
            F.lit(1).cast("int").alias("sel_rank"),
            "id",
            "rel",
            F.col("rel").alias("mmr_score"),
        )
        .localCheckpoint()
    )
    for step in range(2, k + 1):
        remaining = cand.join(
            selected.select(F.col("id").alias("_sid")),
            cand["id"] == F.col("_sid"),
            "left_anti",
        )
        div = (
            pair.join(
                F.broadcast(selected.select(F.col("id").alias("b"))), "b"
            )
            .groupBy("a")
            .agg(F.max("sim").alias("max_sim"))
        )
        pick = (
            remaining.join(div, remaining["id"] == div["a"], "left")
            .select(
                "id",
                "rel",
                (
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.coalesce("max_sim", F.lit(0.0))
                ).alias("mmr_score"),
            )
            .orderBy(F.col("mmr_score").desc(), F.col("id"))
            .limit(1)
            .select(F.lit(step).cast("int").alias("sel_rank"), "id", "rel",
                    "mmr_score")
        )
        selected = selected.unionByName(pick).localCheckpoint()
    return selected
