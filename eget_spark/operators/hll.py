"""HyperLogLog distinct-count sketch as pure relational dataflow.

The frontier-size / distinct-visitor estimator (Flajolet et al. 2007,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm").  A 10^10-URL frontier cannot COUNT(DISTINCT url) cheaply every
round; an m-register HLL costs one map-side-combined aggregate and m rows
of state, mergeable across rounds/partitions by register-wise max — the
same role the bloom/cuckoo filters (operators/seen.py, cuckoo.py) play for
membership, here for cardinality.

Everything is pinned so a SQL oracle reproduces the registers BIT-FOR-BIT:

- hash      = first 60 bits of md5(value) as a BIGINT (the repo-wide
  SQL-portable hash, same construction as minhash in operators/dedup.py)
- bucket    = low p bits; w = remaining 60-p bits
- rho(w)    = leading-zero count of w within its (60-p)-bit width, + 1;
  computed WITHOUT clz/log: smear w's MSB downward with 6 shift-or steps,
  then rho = width - bit_count(smeared) + 1 (w = 0 -> width + 1).  Shifts,
  ors and bit_count are exact integer ops in both engines.
- registers = max rho per bucket (empty bucket = 0)
- harmonic denominator sum(2^-reg) is kept INTEGER: sum(1 << (width+1 -
  reg)) — a scaled exact sum (max m * 2^(width+1) << 2^63), so the only
  floating-point steps are one multiply/divide chain (IEEE exactly-rounded,
  engine-identical) and the small-range ln correction.

Estimate: raw = alpha_m * m^2 / sum(2^-reg); if raw <= 2.5 m and some
register is empty, linear counting m * ln(m / V) applies (the standard
small-range correction).

Scale shape (100 TB): groupBy(bucket) IS the distributed sketch — every map
task pre-combines to <= m rows before the (m-row!) shuffle; the final
single-row reduction is a broadcast-sized aggregate.  No driver-side
per-row work ever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex chars of md5 — positive in a signed 64-bit lane


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _rho(w: Column, width: int) -> Column:
    """Position (1-based) of the highest set bit counted from the MSB of a
    ``width``-bit value, i.e. leading zeros + 1; ``width + 1`` for 0."""
    s = w
    for shift in (1, 2, 4, 8, 16, 32):
        s = s.bitwiseOR(F.shiftrightunsigned(s, shift))
    return (F.lit(width) - F.bit_count(s) + 1).cast("int")


def hll_registers(df: DataFrame, col: Column, p: int = 8) -> DataFrame:
    """The m = 2**p register table (bucket, reg), empty buckets included
    with reg = 0 — the mergeable sketch state (union = max per bucket)."""
    m = 1 << p
    width = HASH_BITS - p
    h = _hash60(col)
    regs = (
        df.select(
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            _rho(F.shiftrightunsigned(h, p), width).alias("_rho"),
        )
        .groupBy("bucket")
        .agg(F.max("_rho").alias("reg"))
    )
    all_buckets = df.sparkSession.range(m).select(F.col("id").alias("bucket"))
    return all_buckets.join(regs, "bucket", "left").select(
        "bucket", F.coalesce("reg", F.lit(0)).cast("int").alias("reg")
    )


def hll_estimate(df: DataFrame, col: Column, p: int = 8) -> DataFrame:
    """One row: (m, v_zero, sum_scaled, estimate) — estimate rounded to 2.

    ``sum_scaled`` = sum over registers of 2^(width+1-reg), the integer-
    scaled harmonic denominator; ``v_zero`` = empty-register count.
    """
    m = 1 << p
    width = HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, col, p)
    one = regs.agg(
        F.count("*").cast("long").alias("m"),
        F.sum((F.col("reg") == 0).cast("long")).alias("v_zero"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {width + 1} - reg)"))
        .cast("long")
        .alias("sum_scaled"),
    )
    # raw = alpha * m^2 / sum(2^-reg); sum(2^-reg) = sum_scaled / 2^(width+1)
    raw = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << (width + 1)))
        / F.col("sum_scaled")
    )
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v_zero") > 0), linear
    ).otherwise(raw)
    return one.select(
        "m", "v_zero", "sum_scaled", F.round(est, 2).alias("estimate")
    )


def hll_estimate_by(
    df: DataFrame, key_col: str, col: Column, p: int = 8
) -> DataFrame:
    """Per-key HLL estimates: one row per distinct ``key_col`` value with
    (m, v_zero, sum_scaled, estimate) — the keyed form of
    :func:`hll_estimate` (e.g. distinct REFERRING HOSTS per target host,
    the link-diversity spam feature: a million links from one domain is
    one unit of diversity).

    Same bit-pinned register/arithmetic contract.  The crucial scale
    difference: empty buckets are NEVER materialized per key (that would
    be |keys| * m rows) — ``v_zero = m - (occupied buckets)`` and the
    harmonic sum adds the empty buckets' ``2^(width+1)`` contribution in
    closed form.  Cost: one map-side-combined groupBy(key, bucket) + one
    map-side groupBy(key); state O(sum of occupied buckets), capped at
    m per key no matter how hot the key is — THE property that makes the
    sketch skew-proof where count(DISTINCT) is not.
    """
    return hll_estimates_from_regs(keyed_hll_regs(df, key_col, col, p), p)


def keyed_hll_regs(df: DataFrame, key_col: str, col: Column, p: int = 8) -> DataFrame:
    """Sparse keyed register rows (key, bucket, reg) — the mergeable
    state behind :func:`hll_estimate_by` (merge = max per (key, bucket));
    exposed for the streaming maintainer (streaming/hll_distinct.py)."""
    m = 1 << p
    width = HASH_BITS - p
    h = _hash60(col)
    return (
        df.select(
            F.col(key_col).alias("key"),
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            _rho(F.shiftrightunsigned(h, p), width).alias("_rho"),
        )
        .groupBy("key", "bucket")
        .agg(F.max("_rho").alias("reg"))
    )


def hll_estimates_from_regs(regs: DataFrame, p: int = 8) -> DataFrame:
    """Per-key estimates from sparse (key, bucket, reg) rows — the
    arithmetic half of :func:`hll_estimate_by`, shared with the
    streaming maintainer so drained-state estimates are bit-equal."""
    m = 1 << p
    width = HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    per_key = regs.groupBy("key").agg(
        F.count("*").cast("long").alias("_occupied"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {width + 1} - reg)"))
        .cast("long")
        .alias("_sum_occ"),
    )
    one = per_key.select(
        "key",
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("_occupied")).cast("long").alias("v_zero"),
        (
            F.col("_sum_occ")
            + (F.lit(m) - F.col("_occupied"))
            * F.lit(1 << (width + 1)).cast("long")
        ).cast("long").alias("sum_scaled"),
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << (width + 1)))
        / F.col("sum_scaled")
    )
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v_zero") > 0), linear
    ).otherwise(raw)
    return one.select(
        "key", "m", "v_zero", "sum_scaled", F.round(est, 2).alias("estimate")
    )
