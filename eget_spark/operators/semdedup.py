"""SemDeDup: semantic deduplication of an embedded corpus.

SemDeDup (Abbas et al. 2023, public paper) removes *semantic* duplicates
— documents whose embeddings are nearly identical even when their text
is not — by (1) clustering the embedding space, (2) finding intra-cluster
pairs above a cosine threshold, and (3) keeping ONE representative per
duplicate group: the member with the LOWEST cosine similarity to its
cluster centroid (the most "outlying" example, which preserves the most
diversity).  Everything here composes already-verified pieces:

- clustering     = the caller's cell column (a k-means/IVF cell id or a
  coarse label; :func:`eget_spark.operators.similarity.centroids` is the
  centroid companion)
- pair finding   = :func:`eget_spark.operators.dedup.embedding_near_dup_pairs`
  (intra-cell only — the O(n^2) kill, float64 higher-order cosine)
- grouping       = :func:`eget_spark.operators.dedup.connected_components`
  (hash-min label propagation, O(diameter) join+agg iterations)
- representative = per-component ``min_by`` on (cosine-to-centroid, id)
  — SemDeDup's keep-the-farthest rule with the id as the pinned
  deterministic tie-break

Scale shape (100 TB): pairing is intra-cell (cells bound the quadratic;
cell sizes are controlled by the clustering granularity), components
iterate joins over the tiny pair set only, the centroid table is one
posexplode aggregate broadcast back, and the final keep decision is one
map-side-combined ``min_by`` HashAggregate keyed on the component id.
No Python, no cartesian, no driver rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eget_spark.operators.dedup import connected_components, embedding_near_dup_pairs
from eget_spark.operators.similarity import centroids, cosine


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    threshold: float = 0.95,
    max_iter: int = 50,
) -> DataFrame:
    """(id, component, centroid_cosine, keep_id, is_kept) per embedding.

    ``component`` is the duplicate group (min reachable id; singletons =
    self), ``centroid_cosine`` the member's rounded cosine to its OWN
    cell centroid, ``keep_id`` the group representative under SemDeDup's
    rule (lowest centroid cosine, ties -> lowest id), ``is_kept`` whether
    this row survives dedup."""
    pairs = embedding_near_dup_pairs(
        emb, id_col, vec_col, label_col=cell_col, threshold=threshold
    )
    comps = connected_components(pairs, max_iter=max_iter)

    cents = centroids(emb, cell_col, vec_col)
    members = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(cell_col).alias("cell"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .join(F.broadcast(cents), "cell")
        .select(
            "id",
            F.round(cosine(F.col("v"), F.col("centroid")), 6).alias(
                "centroid_cosine"
            ),
        )
        .join(comps, "id", "left")
        .withColumn("component", F.coalesce("component", F.col("id")))
    )
    reps = members.groupBy("component").agg(
        F.min(F.struct("centroid_cosine", "id")).alias("rep")
    )
    return (
        members.join(reps, "component")
        .select(
            "id",
            "component",
            "centroid_cosine",
            F.col("rep.id").alias("keep_id"),
            (F.col("rep.id") == F.col("id")).alias("is_kept"),
        )
    )
