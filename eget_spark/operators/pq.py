"""Product quantization (PQ) codes over embedding columns, bit-exact.

The ANN compression tier (Jegou, Douze, Schmid 2011, "Product
quantization for nearest neighbor search" — the public recipe behind
FAISS IVF-PQ): split each D-dim vector into ``m`` contiguous subvectors
of D/m dims, train an INDEPENDENT k-codeword codebook per subspace, and
store each vector as m small codes (D floats -> m * log2(k) bits).  At
100 TB this is what makes embedding search memory-feasible: the engine's
IVF router (operators/similarity.ivf_topk) narrows the candidate set,
PQ codes make the in-cell scan ~100x smaller.

Everything reuses the pinned fixed-point Lloyd recipe of
operators/kmeans.py verbatim (1e-6 scaling via floor(+0.5), md5-seeded
init, argmin ties to the lowest codeword, floor-division centroid
update, empty cells keep their centroid) — per subspace, with the SAME
(md5(id), id) seed rows for every subspace, so a SQL oracle reproduces
every code bit-for-bit.

Scale shape: the m codebooks are driver-side sketch state (m * k * D/m
ints) embedded as LITERALS — final code assignment is ONE zero-shuffle
codegen'd projection emitting all m codes at once.  Training costs
m * n_iter map-side-combined groupBy(cell, dim) aggregates over the
posexploded subvectors; the per-step collect is O(k * D), independent
of corpus size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .kmeans import vec_fp


def _dist_sub(v: Column, cent: list[int]) -> Column:
    # zip_with + aggregate, NOT an unrolled per-dimension sum: measured at
    # sf0.1 the unrolled form (k*m*dim literal element_at terms) overflows
    # the whole-stage-codegen method-size limit and falls back to
    # interpreted projection (11.1 s vs 4.8 s end-to-end); the HOF form
    # keeps the expression tree compact
    c = F.array(*[F.lit(int(x)).cast("long") for x in cent])
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _best_sub(v: Column, cents: list[list[int]]) -> Column:
    return F.array_min(
        F.array(
            *[
                F.named_struct(
                    F.lit("dist"),
                    _dist_sub(v, c),
                    F.lit("cidx"),
                    F.lit(i).cast("int"),
                )
                for i, c in enumerate(cents)
            ]
        )
    )


def _l2_fp(a: Column, b: Column) -> Column:
    """Integer squared L2 between two array<long> columns — the same
    zip_with + aggregate fold as :func:`_dist_sub`, with BOTH sides data
    columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _codebook_df(spark, cents: list[list[list[int]]]):
    """The m x k codebooks as a 1-slice broadcast-able DataFrame
    (sub, cidx, cvec).  Round-6 plan-cost fix: embedding the codebooks as
    LITERAL arrays inside the assignment expressions made every Lloyd
    iteration and every consumer query re-analyze an m*k-codeword HOF
    tree — measured 0.8-2.3 s of pure driver (Catalyst) time per action
    at m=4,k=4, per iteration, per query, and the literals change every
    iteration so nothing caches.  As a broadcast-joined DATA table the
    plan is small and its shape is iteration-invariant; the arithmetic
    (same zip_with/aggregate fold, same (dist, cidx) argmin order) is
    unchanged, so codes are bit-identical."""
    rows = [
        (j, i, [int(x) for x in cents[j][i]])
        for j in range(len(cents))
        for i in range(len(cents[j]))
    ]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "sub int, cidx int, cvec array<bigint>",
    )


def _best_rows(fp: DataFrame, cb: DataFrame, m: int, d_sub: int, *extra_cols):
    """Per-(id, subspace) winning codeword via the broadcast codebook:
    returns (id[, *extra_cols], sub, b) with b = struct(dist, cidx, svec)
    — min over struct is (dist asc, cidx asc), identical to
    :func:`_best_sub`'s array_min tie order (cidx is unique within the
    group, so the trailing svec never decides).  ``fp`` is hash-clustered
    by id, so the groupBy plans with no exchange."""
    sub_structs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("sub"),
                F.slice(F.col("vfp"), j * d_sub + 1, d_sub).alias("svec"),
            )
            for j in range(m)
        ]
    )
    subs = fp.select(
        "id", *extra_cols, F.explode(sub_structs).alias("_s")
    ).select("id", *extra_cols, "_s.sub", "_s.svec")
    cand = subs.join(F.broadcast(cb), "sub").select(
        "id",
        *extra_cols,
        "sub",
        F.struct(
            _l2_fp(F.col("svec"), F.col("cvec")).alias("dist"),
            F.col("cidx").alias("cidx"),
            F.col("svec").alias("svec"),
        ).alias("_c"),
    )
    aggs = [F.min("_c").alias("b")]
    aggs += [F.min(c).alias(c) for c in extra_cols]
    return cand.groupBy("id", "sub").agg(*aggs)


def pq_codes(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
) -> DataFrame:
    """Train per-subspace codebooks and emit (id, code_0..code_{m-1},
    dist_fp) where dist_fp is the total integer quantization distortion
    (sum of per-subspace squared L2 to the chosen codeword).  The vector
    dimension must divide by ``m``."""
    # hash-cluster before persisting: the source is often a single small
    # parquet row group (1-2 effective scan splits), which would leave
    # every training iteration running on 1-2 cores; one narrow exchange
    # of (id, vfp) spreads the Lloyd jobs across the cluster (guide §2.5
    # input skew / §6 split floor)
    fp = df.select(
        F.col(id_col).alias("id"), vec_fp(F.col(vec_col)).alias("vfp")
    ).repartition(F.col("id")).persist()
    # ONE driver job yields both the seeds and the dimension (round 6:
    # the separate limit(1) dimension probe was a whole extra job)
    seed_rows = _seed_rows(fp, k)
    dim = len(seed_rows[0]["vfp"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m

    def sub(j: int, col: Column) -> Column:
        return F.slice(col, j * d_sub + 1, d_sub)

    cents = train_codebooks(fp, m, k, n_iter, d_sub, seed_rows=seed_rows)

    # final assignment via the broadcast codebook (see _codebook_df);
    # one id-clustered aggregate pivots the m winners back to columns
    best = _best_rows(fp, _codebook_df(df.sparkSession, cents), m, d_sub)
    out = best.groupBy("id").agg(
        *[
            F.max(
                F.when(F.col("sub") == j, F.col("b.cidx"))
            ).cast("int").alias(f"code_{j}")
            for j in range(m)
        ],
        F.sum("b.dist").cast("long").alias("dist_fp"),
    )
    # materialize the (narrow) code table from the cache, then release
    # it — the round-5 form unpersisted first, so the final scan paid
    # the parquet read + fixed-point projection a second time
    out = out.localCheckpoint(eager=True)
    fp.unpersist()
    return out


def _seed_rows(fp: DataFrame, k: int) -> list:
    """The k (md5(id), id)-first seed rows (operators/kmeans.py recipe),
    collected once and shared by every subspace AND by the caller's
    dimension check."""
    rows = (
        fp.withColumn("_h", F.md5(F.col("id").cast("string")))
        .orderBy("_h", "id")
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("empty input")
    return rows


# At or under this many collected vector ELEMENTS (rows x dims), Lloyd
# training runs on the driver in numpy instead of one Spark job (plus
# ~0.4 s of Catalyst re-analysis) per iteration — the same size-adaptive
# discipline as operators/sequence.with_global_seq.  1<<24 elements =
# 128 MiB of int64, e.g. 262k vectors at D=64.  Above the bound (the
# 100-TB path) the distributed loop below is unchanged.  Pass 0 via
# ``driver_train_elems`` to force the distributed path.
PQ_DRIVER_TRAIN_ELEMS = 1 << 24


def _train_codebooks_driver(X, m, k, n_iter, d_sub, cents):
    """Driver-side fixed-point Lloyd, bit-identical to the distributed
    loop: every intermediate is an INTEGER below 2^53 (caller-guarded),
    so float64 matmul distances, first-index argmin (= lowest-cidx tie
    order), and floor(double_sum / count) reproduce the pinned int64
    arithmetic exactly."""
    import numpy as np

    subs = [
        X[:, j * d_sub : (j + 1) * d_sub].astype(np.float64) for j in range(m)
    ]
    xx = [(s * s).sum(1) for s in subs]
    for _ in range(n_iter):
        for j in range(m):
            Cj = np.asarray(cents[j], dtype=np.float64)
            dist = (
                xx[j][:, None] - 2.0 * (subs[j] @ Cj.T) + (Cj * Cj).sum(1)[None, :]
            )
            assign = np.argmin(dist, axis=1)
            cnt = np.bincount(assign, minlength=k)
            S = np.zeros((k, d_sub), dtype=np.float64)
            np.add.at(S, assign, subs[j])
            mu = np.floor(S / np.maximum(cnt, 1)[:, None])
            keep = cnt == 0
            if keep.any():
                mu[keep] = Cj[keep]
            cents[j] = [[int(x) for x in row] for row in mu]
    return cents


def train_codebooks(
    fp: DataFrame,
    m: int,
    k: int,
    n_iter: int,
    d_sub: int,
    seed_rows=None,
    driver_train_elems: int | None = None,
) -> list[list[list[int]]]:
    """Per-subspace fixed-point Lloyd codebooks over an (id, vfp) frame —
    the training loop of ``pq_codes``, exposed so IVF-PQ search can
    reuse the trained centroids for ADC distance tables.  Returns
    cents[j][c] = d_sub int64 codeword coordinates.  ``seed_rows`` lets
    the caller share its own seed collect (one job instead of two).

    Size-adaptive (round 6): sub-threshold training sets are collected
    once and iterated on the driver (:func:`_train_codebooks_driver` —
    bit-identical arithmetic, guarded below 2^53 so float64 is exact);
    larger sets run the unchanged distributed loop, one Spark job per
    iteration."""

    def sub(j: int, col: Column) -> Column:
        return F.slice(col, j * d_sub + 1, d_sub)

    # one seed scan shared by every subspace: the k rows first in
    # (md5(id), id) order, same as operators/kmeans.py
    if seed_rows is None:
        seed_rows = _seed_rows(fp, k)
    cents = [
        [list(r["vfp"])[j * d_sub : (j + 1) * d_sub] for r in seed_rows]
        for j in range(m)
    ]

    if driver_train_elems is None:
        driver_train_elems = PQ_DRIVER_TRAIN_ELEMS
    d = m * d_sub
    if driver_train_elems > 0 and n_iter > 0:
        n_rows = fp.count()
        if 0 < n_rows * d <= driver_train_elems:
            import numpy as np

            flat = (
                fp.select("vfp").toArrow().column("vfp").combine_chunks().flatten()
            )
            vals = flat.to_numpy(zero_copy_only=False)
            # exactness guards: every vector must have exactly d dims,
            # and the worst-case squared-distance sum must stay an
            # integer below 2^53 for float64 to be exact (+2 slack: a
            # floored mean can sit one unit outside the data range) —
            # otherwise fall through to the exact int64 distributed loop
            if len(vals) == n_rows * d and (
                d_sub * (2.0 * max(np.abs(vals).max(), 1.0) + 2.0) ** 2
                < 2.0**53
            ):
                X = vals.reshape(n_rows, d)
                return _train_codebooks_driver(X, m, k, n_iter, d_sub, cents)

    spark = fp.sparkSession
    for _ in range(n_iter):
        # ONE job updates ALL m codebooks; the codebooks ride as a
        # broadcast DATA table (see _codebook_df — iteration-invariant
        # plan shape, no literal re-analysis), the winner's subvector is
        # carried by the argmin struct and exploded for the means
        best = _best_rows(fp.select("id", "vfp"), _codebook_df(spark, cents), m, d_sub)
        ex = best.select(
            "sub",
            F.col("b.cidx").alias("cluster"),
            F.posexplode("b.svec").alias("spos0", "x"),
        ).select("sub", "cluster", (F.col("spos0")).alias("spos"), "x")
        mean_rows = (
            ex.groupBy("sub", "cluster", "spos")
            .agg(
                F.floor(F.sum("x").cast("double") / F.count("*"))
                .cast("long")
                .alias("mu")
            )
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, int]] = {}
        for r in mean_rows:
            acc.setdefault((r["sub"], r["cluster"]), {})[r["spos"]] = r["mu"]
        for j in range(m):
            cents[j] = [
                [acc[(j, i)][p] for p in range(d_sub)]
                if (j, i) in acc
                else cents[j][i]
                for i in range(k)
            ]

    return cents


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k_codes: int = 4,
    n_iter: int = 2,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-PQ approximate nearest neighbors (the full FAISS-style scale
    path, Jegou et al. 2011 §IV): an IVF coarse quantizer routes each
    query to its ``nprobe`` nearest cells, and candidates inside those
    cells are scored by ADC — the asymmetric distance sum of per-
    subspace lookup-table entries ``dt[j][code_j]`` — instead of raw
    vectors.  Returns (query_id, neighbor_id, adc_fp, rank).

    Exact semantics (pinned, ALL integer arithmetic so both engines
    agree bit-for-bit): vectors quantize to 1e-6 fixed-point int64;
    cell centroids are per-dim floor-divided means; routing ties break
    (dist asc, cell asc); codebooks are the q93 Lloyd recipe; adc_fp =
    sum_j ||q_sub_j - codeword[code_j]||^2 on the fp ints; final ties
    (adc asc, neighbor_id asc); self-matches dropped.

    Scale shape (why this is the 100-TB ANN story): the corpus is
    touched ONCE to emit m-byte-scale codes (a zero-shuffle literal-
    codebook projection — ~100x smaller than raw vectors, the scan that
    fits in memory); routing joins queries against a BROADCAST cell-
    centroid table; scoring joins the code table against the broadcast
    routed queries on the cell key — candidates stream, the only
    shuffle is the per-query top-k window, partitioned by query_id."""
    # same split-floor clustering as pq_codes: spread training/routing/
    # scoring jobs even when the corpus scans as 1-2 row-group splits
    fp = corpus.select(
        F.col(id_col).alias("id"),
        F.col(cell_col).alias("cell"),
        vec_fp(F.col(vec_col)).alias("vfp"),
    ).repartition(F.col("id")).persist()
    seed_rows = _seed_rows(fp, k_codes)
    dim = len(seed_rows[0]["vfp"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m

    def sub(j: int, col: Column) -> Column:
        return F.slice(col, j * d_sub + 1, d_sub)

    cents = train_codebooks(
        fp.select("id", "vfp"), m, k_codes, n_iter, d_sub, seed_rows=seed_rows
    )

    # m-byte-scale code table via the broadcast codebook (_codebook_df):
    # one id-clustered assignment + pivot, no literal trees in any plan
    spark = corpus.sparkSession
    cb = _codebook_df(spark, cents)
    best = _best_rows(fp, cb, m, d_sub, "cell")
    codes = best.groupBy("id").agg(
        F.min("cell").alias("cell"),
        *[
            F.max(F.when(F.col("sub") == j, F.col("b.cidx")))
            .cast("int")
            .alias(f"code_{j}")
            for j in range(m)
        ],
    ).select("id", "cell", *[f"code_{j}" for j in range(m)])

    # integer cell centroids (floor-divided per-dim means)
    ccent = (
        fp.select("cell", F.posexplode("vfp").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(
            F.floor(F.sum("x").cast("double") / F.count("*"))
            .cast("long")
            .alias("mu")
        )
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                lambda s: s["mu"],
            ).alias("cvec")
        )
    )

    def l2(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # per-query ADC distance tables from the SAME broadcast codebook: one
    # (query_id, sub, cidx, dist) pass collapsed to a flat m*k lookup
    # array ordered by (sub, cidx) — dt[j][c] == dtflat[j*k + c]
    qfp = queries.select(
        F.col(id_col).alias("query_id"), vec_fp(F.col(vec_col)).alias("qfp")
    )
    qsubs = qfp.select(
        "query_id",
        "qfp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("sub"),
                        sub(j, F.col("qfp")).alias("svec"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("_s"),
    ).select("query_id", "_s.sub", "_s.svec")
    dtab = (
        qsubs.join(F.broadcast(cb), "sub")
        .select(
            "query_id",
            F.struct(
                "sub", "cidx", _l2_fp(F.col("svec"), F.col("cvec")).alias("d")
            ).alias("_e"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("_e")), lambda s: s["d"]
            ).alias("dtflat")
        )
    )
    routed = (
        qfp.join(F.broadcast(ccent))
        .select(
            "query_id", "cell", l2(F.col("qfp"), F.col("cvec")).alias("cd")
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cd").asc(), F.col("cell").asc()
                )
            ),
        )
        .where(F.col("crank") <= nprobe)
        .select("query_id", "cell")
        .join(F.broadcast(dtab), "query_id")
    )
    adc = reduce(
        lambda a, j: a
        + F.get(F.col("dtflat"), F.lit(j * k_codes) + F.col(f"code_{j}")),
        range(1, m),
        F.get(F.col("dtflat"), F.col("code_0")),
    )
    scored = (
        codes.join(F.broadcast(routed), "cell")
        .where(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            adc.alias("adc_fp"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_fp").asc(), F.col("neighbor_id").asc()
    )
    out = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    # materialize the (tiny) top-k from the cache, then release it — the
    # round-5 form unpersisted first, so the final scan recomputed the
    # fixed-point corpus projection
    out = out.localCheckpoint(eager=True)
    fp.unpersist()
    return out


def pq_oracle_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
) -> str:
    """Unrolled ANSI-SQL (DuckDB dialect) equivalent — one Lloyd CTE
    chain per subspace, mirroring operators/kmeans.kmeans_oracle_sql."""
    d_sub = dim // m

    def dist(sv: str, cv: str) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({sv}, {cv}), "
            "p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
        )

    parts = [
        f"""
WITH fp AS (
  SELECT {id_col} AS id,
         list_transform({vec_col},
                        x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS vfp
  FROM {table}
),
fs AS (
  SELECT id, {", ".join(f"vfp[{j * d_sub + 1}:{(j + 1) * d_sub}] AS s{j}" for j in range(m))}
  FROM fp
)"""
    ]
    for j in range(m):
        parts.append(
            f""",
c0_{j} AS (
  SELECT (row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1) AS cidx,
         s{j} AS cvec
  FROM fs QUALIFY cidx < {k}
)"""
        )
        for i in range(1, n_iter + 1):
            parts.append(
                f""",
a{i}_{j} AS (
  SELECT id, s{j}, cidx, dist,
         row_number() OVER (PARTITION BY id ORDER BY dist, cidx) AS rn
  FROM (SELECT f.id, f.s{j}, c.cidx, {dist(f"f.s{j}", "c.cvec")} AS dist
        FROM fs f CROSS JOIN c{i-1}_{j} c)
),
m{i}_{j} AS (
  SELECT cidx, list(mu ORDER BY pos) AS cvec
  FROM (SELECT cidx, pos, CAST(floor(sum(x) / count(*)) AS BIGINT) AS mu
        FROM (SELECT cidx, unnest(s{j}) AS x,
                     generate_subscripts(s{j}, 1) AS pos
              FROM a{i}_{j} WHERE rn = 1)
        GROUP BY cidx, pos)
  GROUP BY cidx
),
c{i}_{j} AS (
  SELECT p.cidx, coalesce(n.cvec, p.cvec) AS cvec
  FROM c{i-1}_{j} p LEFT JOIN m{i}_{j} n ON n.cidx = p.cidx
)"""
            )
        parts.append(
            f""",
r_{j} AS (
  SELECT id, CAST(cidx AS INT) AS code_{j}, dist AS dist_{j}
  FROM (
    SELECT f.id, c.cidx, {dist(f"f.s{j}", "c.cvec")} AS dist,
           row_number() OVER (PARTITION BY f.id
                              ORDER BY {dist(f"f.s{j}", "c.cvec")}, c.cidx) AS rn
    FROM fs f CROSS JOIN c{n_iter}_{j} c
  ) WHERE rn = 1
)"""
        )
    joins = " ".join(f"JOIN r_{j} USING (id)" for j in range(1, m))
    codes = ", ".join(f"code_{j}" for j in range(m))
    dsum = " + ".join(f"dist_{j}" for j in range(m))
    parts.append(
        f"""
SELECT id, {codes}, CAST({dsum} AS BIGINT) AS dist_fp
FROM r_0 {joins}"""
    )
    return "".join(parts)


def ivf_pq_oracle_sql(
    table: str,
    id_col: str,
    vec_col: str,
    cell_col: str,
    dim: int,
    m: int = 4,
    k_codes: int = 4,
    n_iter: int = 2,
    k: int = 5,
    nprobe: int = 2,
    query_pred: str = "id % 97 = 0",
) -> str:
    """DuckDB-dialect oracle for ``ivf_pq_topk`` with queries drawn from
    the corpus by ``query_pred`` (over the aliased ``id``).  Reuses the
    full per-subspace Lloyd CTE chain of ``pq_oracle_sql`` (prefix up to
    the r_j assignment CTEs), then adds IVF routing and ADC scoring —
    every distance is BIGINT arithmetic, so the match is bit-exact."""
    d_sub = dim // m
    base = pq_oracle_sql(table, id_col, vec_col, dim, m, k_codes, n_iter)
    # keep everything up to (not including) the final SELECT of the base
    prefix = base[: base.rindex("\nSELECT id,")]

    def dist(sv: str, cv: str) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({sv}, {cv}), "
            "p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
        )

    code_joins = " ".join(f"JOIN r_{j} USING (id)" for j in range(1, m))
    cb_joins = " ".join(
        f"JOIN c{n_iter}_{j} cb{j} ON cb{j}.cidx = x.code_{j}" for j in range(m)
    )
    adc = " + ".join(dist(f"qs.s{j}", f"cb{j}.cvec") for j in range(m))
    return f"""{prefix},
codes AS (
  SELECT id, {", ".join(f"code_{j}" for j in range(m))} FROM r_0 {code_joins}
),
cellof AS (SELECT {id_col} AS id, {cell_col} AS cell FROM {table}),
ccent AS (
  SELECT cell, list(mu ORDER BY pos) AS cvec
  FROM (SELECT cell, pos, CAST(floor(sum(x) / count(*)) AS BIGINT) AS mu
        FROM (SELECT c.cell, unnest(f.vfp) AS x,
                     generate_subscripts(f.vfp, 1) AS pos
              FROM fp f JOIN cellof c USING (id))
        GROUP BY cell, pos)
  GROUP BY cell
),
routed AS (
  SELECT query_id, cell FROM (
    SELECT q.id AS query_id, c.cell,
           row_number() OVER (PARTITION BY q.id
                              ORDER BY {dist("q.vfp", "c.cvec")}, c.cell) AS rn
    FROM (SELECT * FROM fp WHERE {query_pred}) q CROSS JOIN ccent c
  ) WHERE rn <= {nprobe}
),
qsub AS (SELECT id AS query_id, {", ".join(f"s{j}" for j in range(m))}
         FROM fs WHERE {query_pred}),
scored AS (
  SELECT r.query_id, x.id AS neighbor_id,
         CAST({adc} AS BIGINT) AS adc_fp
  FROM routed r
  JOIN cellof cf ON cf.cell = r.cell
  JOIN codes x ON x.id = cf.id AND x.id <> r.query_id
  JOIN qsub qs ON qs.query_id = r.query_id
  {cb_joins}
)
SELECT query_id, neighbor_id, adc_fp, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_fp, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""
