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
