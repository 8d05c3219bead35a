"""Frontier capacity planner: seen-set and shuffle sizing from corpus
counts — the closed-form answer to "what does the 10^10-URL frontier
cost" that the north-star architecture (partitioned Bloom/cuckoo seen
set, url-hash shuffles) needs BEFORE a run is launched.

Public formulas:
- Bloom (Bloom 1970 / standard optimal sizing):
  ``m = n * ln(1/p) / ln(2)^2`` bits, ``k = (m/n) * ln 2`` hashes.
- Cuckoo filter (Fan, Andersen, Kaminsky & Mitzenmacher, CoNLL'14
  "Cuckoo Filter: Practically Better Than Bloom"): 4-slot buckets at
  ~95% load, fingerprint ``f >= ceil(log2(2b/p))`` bits (b = 4).
- Shuffle partitioning: partitions = ceil(n / rows_per_partition) with
  the repo's planning default of 4M rows/partition (a ~128 MB parquet
  split of 32-byte keyed rows).

Determinism contract: every formula is evaluated in INTEGER micro-unit
arithmetic with PINNED constants — ``ln 10 = 2302585/1e6``,
``ln 2 = 693147/1e6``, ``ln(2)^2 = 480453/1e6`` — never the engine's
libm, so a 1-ulp ln() difference between the JVM and DuckDB can never
flip a ceil/round boundary: the report is bit-exact cross-engine by
construction.  Target FPRs are exact powers of ten (p = 10^-k), which
is what makes ``ln(1/p) = k * ln 10`` integer-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LN10_MICRO = 2_302_585  # ln(10)  * 1e6, pinned (not libm)
LN2_MICRO = 693_147  # ln(2)   * 1e6, pinned
LN2SQ_MICRO = 480_453  # ln(2)^2 * 1e6, pinned
ROWS_PER_PARTITION = 4_000_000  # planning default: ~128 MB of keyed rows
CUCKOO_SLOTS = 4  # bucket width b (Fan et al. table 2)
CUCKOO_LOAD_PCT = 95  # sustainable load factor at b = 4


def frontier_capacity_plan(
    urls: DataFrame, fpr_exponents: list[int] = (2, 3, 4)
) -> DataFrame:
    """One row per target FPR ``p = 10^-k``: the seen-set and shuffle
    sizing for ``n = |urls|`` (already-deduped URL count).

    Columns: (target_fpr_exp, n_urls, bloom_bits, bloom_hashes,
    bloom_mib, cuckoo_fp_bits, cuckoo_buckets, cuckoo_mib,
    shuffle_partitions) — bits/hashes/buckets exact int64 by the pinned
    micro-unit formulas (ceil = floor + 1 on non-exact division,
    round-half-up on hashes); MiB columns are the single final division
    rounded to 3 (the only floats, derived from exact ints).

    Scale shape: ONE count aggregate; the per-FPR rows are a literal
    explode over the tiny exponent list — pure projection after the
    1-row reduction."""
    n_df = urls.agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    exps = F.array(*[F.lit(int(k)) for k in fpr_exponents])
    rows = n_df.select(
        "n_urls", F.explode(exps).alias("_k")
    ).select("n_urls", F.col("_k").cast("int").alias("target_fpr_exp"))
    # bloom_bits = ceil(n * k*ln10 / ln2^2) in micro-units
    bits = F.expr(
        f"CAST(n_urls * target_fpr_exp * {LN10_MICRO} div {LN2SQ_MICRO}"
        f" + CASE WHEN (n_urls * target_fpr_exp * {LN10_MICRO})"
        f" % {LN2SQ_MICRO} = 0 THEN 0 ELSE 1 END AS BIGINT)"
    )
    rows = rows.withColumn("bloom_bits", bits)
    # hashes = round(bits/n * ln2) = (bits*ln2_micro + n*5e5) div (n*1e6)
    rows = rows.withColumn(
        "bloom_hashes",
        F.expr(
            f"CAST((bloom_bits * {LN2_MICRO} + n_urls * 500000)"
            " div (n_urls * 1000000) AS BIGINT)"
        ),
    )
    # cuckoo fingerprint bits: ceil(log2(2b/p)) = ceil(log2(8) + k*log2(10))
    # log2(10)*1e6 pinned = 3321928; ceil over micro-units
    rows = rows.withColumn(
        "cuckoo_fp_bits",
        F.expr(
            "CAST(3 + (target_fpr_exp * 3321928 div 1000000)"
            " + CASE WHEN (target_fpr_exp * 3321928) % 1000000 = 0"
            " THEN 0 ELSE 1 END AS BIGINT)"
        ),
    )
    # buckets = ceil(n / (slots * load)) rounded UP to a power of two
    # (cuckoo addressing needs pow2): exact integer ceil then bit-smear
    raw_buckets = F.expr(
        f"CAST(n_urls * 100 div {CUCKOO_SLOTS * CUCKOO_LOAD_PCT}"
        f" + CASE WHEN (n_urls * 100) % {CUCKOO_SLOTS * CUCKOO_LOAD_PCT} = 0"
        " THEN 0 ELSE 1 END AS BIGINT)"
    )
    rows = rows.withColumn("_rb", raw_buckets)
    # next power of two of _rb (>=1) by the pure-integer bit smear
    # (y = _rb - 1; y |= y>>1 .. y>>32; y + 1) — no float log2 whose
    # 1-ulp wobble could flip a ceil at exact powers of two
    rows = rows.withColumn("_y", F.expr("CAST(_rb - 1 AS BIGINT)"))
    for s in (1, 2, 4, 8, 16, 32):
        rows = rows.withColumn(
            "_y", F.expr(f"CAST(_y | shiftright(_y, {s}) AS BIGINT)")
        )
    rows = rows.withColumn(
        "cuckoo_buckets",
        F.expr("CAST(CASE WHEN _rb <= 1 THEN 1 ELSE _y + 1 END AS BIGINT)"),
    )
    rows = rows.withColumn(
        "shuffle_partitions",
        F.expr(
            f"CAST(n_urls div {ROWS_PER_PARTITION}"
            f" + CASE WHEN n_urls % {ROWS_PER_PARTITION} = 0"
            " THEN 0 ELSE 1 END AS BIGINT)"
        ),
    )
    return rows.select(
        "target_fpr_exp",
        "n_urls",
        "bloom_bits",
        "bloom_hashes",
        F.round(F.col("bloom_bits") / (8.0 * 1024 * 1024), 3).alias(
            "bloom_mib"
        ),
        "cuckoo_fp_bits",
        "cuckoo_buckets",
        F.round(
            (F.col("cuckoo_buckets") * CUCKOO_SLOTS * F.col("cuckoo_fp_bits"))
            / (8.0 * 1024 * 1024),
            3,
        ).alias("cuckoo_mib"),
        "shuffle_partitions",
    )
