"""Lloyd's k-means over embedding columns, in bit-exact fixed point.

The IVF coarse quantizer trainer: `operators/similarity.ivf_topk` routes
ANN queries through cell centroids — this operator LEARNS those cells from
the data (Lloyd 1982; the IVF usage is public in Jegou et al. 2011,
"Product quantization for nearest neighbor search").

Floating-point k-means is not reproducible across engines (reduction order
changes the sums), so — like `operators/graph.pagerank_fixed` — everything
runs in integer fixed point, pinned so a SQL oracle reproduces every
centroid and assignment bit-for-bit:

- vectors scale to int64 at 1e-6 resolution: ``floor(x * 1e6 + 0.5)``
  (floor(+0.5) instead of round(): engines disagree on half-even vs
  half-up, floor is exact everywhere)
- init      = the k vectors first in ``(md5(id), id)`` order — the
  deterministic stand-in for random seeding (the repo-wide md5 shuffle
  trick, cf. operators/sampling.py)
- distance  = integer squared L2 (diffs <= ~4e6, squared * 64 dims
  ~ 1e15 << 2^63 — no overflow)
- assignment= argmin by ``(dist, cidx)`` — ties pinned to the lowest cell
- update    = per-dimension ``floor(sum / count)`` — the division is ONE
  exactly-rounded IEEE op on integer-valued doubles (< 2^53), so both
  engines floor the same value; empty cells keep their previous centroid

Scale shape (100 TB of embeddings): the k centroids are driver-side state
(k x dim ints — sketch-sized, like the cuckoo filter's stash) embedded as
LITERALS in the assignment expression, so assignment is a ZERO-SHUFFLE
codegen'd projection — no k-way row explosion, no crossJoin. Each Lloyd
step costs exactly one map-side-combined shuffle: groupBy(cell, dim) over
the posexploded vectors (64 k rows per map task max). The per-step k x dim
collect is O(k*dim), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_SCALE = 10**6


def vec_fp(col: Column) -> Column:
    """float vector -> int64 fixed-point vector at 1e-6 resolution."""
    return F.transform(
        col.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(FP_SCALE)) + F.lit(0.5)).cast("long"),
    )


def _dist_fp(v: Column, cent: list[int]) -> Column:
    """Integer squared L2 between a vector column and a literal centroid."""
    c = F.array(*[F.lit(int(x)).cast("long") for x in cent])
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _best(cents: list[list[int]]) -> Column:
    """struct(dist, cidx) of the argmin centroid for column ``vfp``."""
    # named_struct, not struct(alias): F.array normalizes plain struct
    # fields to col1/col2, dropping the aliases
    return F.array_min(
        F.array(
            *[
                F.named_struct(
                    F.lit("dist"),
                    _dist_fp(F.col("vfp"), c),
                    F.lit("cidx"),
                    F.lit(i).cast("int"),
                )
                for i, c in enumerate(cents)
            ]
        )
    )


def kmeans_fp(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    n_iter: int = 2,
) -> DataFrame:
    """``n_iter`` Lloyd steps from the md5-seeded init; returns the final
    assignment (id, cluster, dist_fp) against the post-iteration centroids.

    The returned plan embeds the trained centroids as literals — reusable
    as the IVF cell router without any join.
    """
    # cluster before persisting so Lloyd iterations parallelize even when
    # the source scans as 1-2 row-group splits (see pq.py, guide §2.5/§6)
    fp = df.select(
        F.col(id_col).alias("id"), vec_fp(F.col(vec_col)).alias("vfp")
    ).repartition(F.col("id")).persist()
    seed = fp.withColumn("_h", F.md5(F.col("id").cast("string")))
    cents = [list(r["vfp"]) for r in seed.orderBy("_h", "id").limit(k).collect()]
    if len(cents) < k:
        fp.unpersist()
        raise ValueError(f"k={k} exceeds the {len(cents)} input rows")

    # size-adaptive training (round 6, same discipline as pq.py): a
    # sub-threshold training set is collected once from the cache and
    # iterated on the driver in numpy — bit-identical arithmetic, guarded
    # below 2^53 so float64 is exact; one job instead of one Spark job +
    # ~0.4 s of Catalyst re-analysis per Lloyd iteration.  Above the
    # bound the distributed loop below is the unchanged 100-TB path.
    if n_iter > 0 and cents:
        from .pq import PQ_DRIVER_TRAIN_ELEMS, _train_codebooks_driver

        d = len(cents[0])
        n_rows = fp.count()
        if 0 < n_rows * d <= PQ_DRIVER_TRAIN_ELEMS:
            import numpy as np

            vals = (
                fp.select("vfp")
                .toArrow()
                .column("vfp")
                .combine_chunks()
                .flatten()
                .to_numpy(zero_copy_only=False)
            )
            if len(vals) == n_rows * d and (
                d * (2.0 * max(np.abs(vals).max(), 1.0) + 2.0) ** 2 < 2.0**53
            ):
                cents = _train_codebooks_driver(
                    vals.reshape(n_rows, d), 1, k, n_iter, d, [cents]
                )[0]
                n_iter = 0  # trained; skip the distributed loop

    for _ in range(n_iter):
        # bind the cluster id BEFORE the posexplode: an expression in the
        # same projection as a Generate is re-evaluated once per EXPLODED
        # row (dim x the k-centroid argmin work) — the trap pq.py:~95
        # documents and avoids
        assign = fp.select(
            "vfp", _best(cents)["cidx"].alias("cluster")
        ).select(
            F.posexplode("vfp").alias("pos", "x"), F.col("cluster")
        )
        mean_rows = (
            assign.groupBy("cluster", "pos")
            .agg(
                F.floor(F.sum("x").cast("double") / F.count("*"))
                .cast("long")
                .alias("m")
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster", F.transform("pm", lambda s: s["m"]).alias("cvec")
            )
            .collect()
        )
        new = {r["cluster"]: list(r["cvec"]) for r in mean_rows}
        cents = [new.get(i, cents[i]) for i in range(k)]

    best = _best(cents)
    out = fp.select(
        "id",
        best["cidx"].alias("cluster"),
        best["dist"].alias("dist_fp"),
    )
    # cache served the seed scan + n_iter training jobs; the single
    # downstream scan of `out` recomputes the cheap projection — don't
    # leak executor storage across calls
    fp.unpersist()
    return out


def kmeans_oracle_sql(table: str, id_col: str, vec_col: str, k: int = 4, n_iter: int = 2) -> str:
    """The exact unrolled ANSI-SQL equivalent (DuckDB dialect) — one CTE
    pair (assignment, centroid update) per Lloyd step, mirroring the
    pinned semantics above term for term."""
    dist = (
        "CAST(list_sum(list_transform(list_zip(f.vfp, c.cvec), "
        "p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
    )
    parts = [
        f"""
WITH fp AS (
  SELECT {id_col} AS id,
         -- CAST to DOUBLE first: a bare 1000000.0 literal is DECIMAL and
         -- FLOAT * DECIMAL stays in float32 precision (silent drift)
         list_transform({vec_col},
                        x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS vfp
  FROM {table}
),
c0 AS (
  SELECT (row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1) AS cidx,
         vfp AS cvec
  FROM fp QUALIFY cidx < {k}
)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
a{i} AS (
  SELECT id, vfp, cidx, dist,
         row_number() OVER (PARTITION BY id ORDER BY dist, cidx) AS rn
  FROM (SELECT f.id, f.vfp, c.cidx, {dist} AS dist
        FROM fp f CROSS JOIN c{i-1} c)
),
m{i} AS (
  SELECT cidx, list(m ORDER BY pos) AS cvec
  FROM (SELECT cidx, pos, CAST(floor(sum(x) / count(*)) AS BIGINT) AS m
        FROM (SELECT cidx, unnest(vfp) AS x, generate_subscripts(vfp, 1) AS pos
              FROM a{i} WHERE rn = 1)
        GROUP BY cidx, pos)
  GROUP BY cidx
),
c{i} AS (
  SELECT p.cidx, coalesce(n.cvec, p.cvec) AS cvec
  FROM c{i-1} p LEFT JOIN m{i} n ON n.cidx = p.cidx
)"""
        )
    parts.append(
        f"""
SELECT id, CAST(cidx AS INT) AS cluster, dist AS dist_fp
FROM (
  SELECT f.id, c.cidx, {dist} AS dist,
         row_number() OVER (PARTITION BY f.id ORDER BY {dist}, c.cidx) AS rn
  FROM fp f CROSS JOIN c{n_iter} c
) WHERE rn = 1"""
    )
    return "".join(parts)


def cluster_outliers(
    assign: DataFrame,
    p_num: int = 19,
    p_den: int = 20,
) -> DataFrame:
    """Per-cluster embedding-outlier trim (the CLIP-filtering/garbage-cell
    step of an embedding curation pipeline): a vector is an outlier iff
    its distance to its assigned centroid exceeds the cluster's exact
    p-quantile (value at rank ceil(p*n), the q108 rank discipline — no
    float percentile interpolation, engine-exact).

    ``assign`` is :func:`kmeans_fp` output (id, cluster, dist_fp).  One
    window shuffle on cluster (k is small but each cell can be huge —
    the rank is computed distributed, never collected); the k-row cutoff
    table broadcasts back onto the assignment.  Output (id, cluster,
    dist_fp, cutoff_fp, outlier).
    """
    from fractions import Fraction

    from .quantiles import exact_quantiles

    # exact_quantiles names its column from the REDUCED fraction
    # (95/100 -> q_19_20); reduce first so any equivalent form works
    frac = Fraction(p_num, p_den)
    q = exact_quantiles(
        assign, "cluster", "dist_fp", "id", ps=(frac,)
    ).select(
        F.col("key").alias("cluster"),
        F.col(f"q_{frac.numerator}_{frac.denominator}").alias("cutoff_fp"),
    )
    return assign.join(F.broadcast(q), "cluster").select(
        "id",
        "cluster",
        "dist_fp",
        "cutoff_fp",
        (F.col("dist_fp") > F.col("cutoff_fp")).alias("outlier"),
    )
