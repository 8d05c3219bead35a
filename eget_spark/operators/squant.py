"""Int8 scalar quantization of embedding vectors, bit-exact.

ANN-compression extension (companion to operators/pq.py; the public
recipe is FAISS's ``ScalarQuantizer`` / the int8 path every vector DB
ships): store each float vector as one per-vector scale plus D int8
codes (4 bytes/dim -> 1 byte/dim + 8 bytes).  At 100 TB of embeddings
this is the cheap first compression tier — PQ (operators/pq.py) goes
further but needs trained codebooks; scalar quantization is
training-free and decodes with one multiply.

Pinned semantics (engine-exact, integer-only; SYMMETRIC max-abs
quantization, the onnxruntime/faiss QT_8bit_direct-style rule):

- vectors enter as the repo-standard 1e-6 fixed-point int64 form
  (operators/kmeans.vec_fp);
- ``scale_fp = max_i |v_i|`` (int64, 1e-6 units); all-zero vectors pin
  ``scale_fp = 0`` and every code to 0;
- ``code_i = sign(v_i) * ((127 * |v_i|) div scale_fp)`` — codes lie in
  [-127, 127], floor division on the non-negative magnitude so Spark's
  ``div`` and DuckDB's ``//`` agree exactly;
- reconstruction ``r_i = sign(code_i) * ((|code_i| * scale_fp) div 127)``
  and ``recon_err_fp2 = sum_i (v_i - r_i)^2`` (1e-12 units) — the
  quality diagnostic callers threshold on.

Scale shape (100 TB): ONE zero-shuffle whole-stage-codegen projection —
higher-order transform/aggregate over the array column, no join, no
window, no Python, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .kmeans import vec_fp


def scalar_quantize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, scale_fp, codes array<long in [-127,127]>, recon_err_fp2)."""
    from pyspark.sql import functions as F

    base = df.select(
        F.col(id_col).alias("id"), vec_fp(F.col(vec_col)).alias("_vfp")
    )
    with_scale = base.selectExpr(
        "id",
        "_vfp",
        "aggregate(_vfp, CAST(0 AS BIGINT), (acc, x)"
        " -> greatest(acc, abs(x))) AS scale_fp",
    )
    coded = with_scale.selectExpr(
        "id",
        "_vfp",
        "scale_fp",
        "transform(_vfp, x -> CASE WHEN scale_fp = 0 THEN CAST(0 AS BIGINT)"
        " ELSE (CASE WHEN x < 0 THEN -1 ELSE 1 END)"
        "      * ((127 * abs(x)) div scale_fp) END) AS codes",
    )
    return coded.selectExpr(
        "id",
        "scale_fp",
        "codes",
        "aggregate(zip_with(_vfp, codes, (v, c) -> (v -"
        "   (CASE WHEN c < 0 THEN -1 ELSE 1 END)"
        "   * ((abs(c) * scale_fp) div 127))"
        " * (v - (CASE WHEN c < 0 THEN -1 ELSE 1 END)"
        "   * ((abs(c) * scale_fp) div 127))),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS recon_err_fp2",
    )


SCALAR_QUANTIZE_ORACLE_SQL = """
WITH base AS (
  SELECT {id} AS id,
         list_transform({vec},
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
           AS vfp
  FROM {src}
),
scaled AS (
  SELECT id, vfp,
         list_reduce(list_prepend(CAST(0 AS BIGINT), vfp),
                     (acc, x) -> greatest(acc, abs(x))) AS scale_fp
  FROM base
),
coded AS (
  SELECT id, vfp, scale_fp,
         list_transform(vfp,
           x -> CASE WHEN scale_fp = 0 THEN CAST(0 AS BIGINT)
                ELSE (CASE WHEN x < 0 THEN -1 ELSE 1 END)
                     * ((127 * abs(x)) // scale_fp) END) AS codes
  FROM scaled
)
SELECT id, scale_fp, codes,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(generate_series(1, len(vfp)),
           i -> (vfp[i] - (CASE WHEN codes[i] < 0 THEN -1 ELSE 1 END)
                 * ((abs(codes[i]) * scale_fp) // 127))
              * (vfp[i] - (CASE WHEN codes[i] < 0 THEN -1 ELSE 1 END)
                 * ((abs(codes[i]) * scale_fp) // 127)))),
         (acc, x) -> acc + x) AS BIGINT) AS recon_err_fp2
FROM coded
"""
