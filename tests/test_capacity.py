"""Frontier capacity planner (operators/capacity.py) vs a pure-Python
micro-unit oracle and the published closed forms."""

import math

from eget_spark.operators.capacity import (
    CUCKOO_LOAD_PCT,
    CUCKOO_SLOTS,
    LN2_MICRO,
    LN2SQ_MICRO,
    LN10_MICRO,
    ROWS_PER_PARTITION,
    frontier_capacity_plan,
)


def _py_plan(n, ks):
    out = {}
    for k in ks:
        num = n * k * LN10_MICRO
        bits = num // LN2SQ_MICRO + (0 if num % LN2SQ_MICRO == 0 else 1)
        hashes = (bits * LN2_MICRO + n * 500000) // (n * 1000000)
        fp_num = k * 3321928
        fp = 3 + fp_num // 1000000 + (0 if fp_num % 1000000 == 0 else 1)
        den = CUCKOO_SLOTS * CUCKOO_LOAD_PCT
        rb = n * 100 // den + (0 if (n * 100) % den == 0 else 1)
        buckets = 1 if rb <= 1 else 1 << (rb - 1).bit_length()
        parts = n // ROWS_PER_PARTITION + (
            0 if n % ROWS_PER_PARTITION == 0 else 1
        )
        out[k] = (n, bits, hashes, fp, buckets, parts)
    return out


def test_capacity_matches_python_oracle(spark):
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(2345)], "url string"
    )
    got = {
        r.target_fpr_exp: (
            r.n_urls, r.bloom_bits, r.bloom_hashes, r.cuckoo_fp_bits,
            r.cuckoo_buckets, r.shuffle_partitions,
        )
        for r in frontier_capacity_plan(df).collect()
    }
    assert got == _py_plan(2345, (2, 3, 4))


def test_capacity_tracks_published_closed_forms(spark):
    # the pinned micro-unit integers must stay within 0.01% of the real
    # formulas (they differ only by the 1e-6 constant quantization)
    n = 100_000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "url string")
    rows = {r.target_fpr_exp: r for r in frontier_capacity_plan(df).collect()}
    for k in (2, 3, 4):
        p = 10.0 ** -k
        want_bits = n * math.log(1 / p) / math.log(2) ** 2
        assert abs(rows[k].bloom_bits - want_bits) / want_bits < 1e-4
        assert rows[k].bloom_hashes == round(
            rows[k].bloom_bits / n * math.log(2)
        )
        # Fan et al.: f >= ceil(log2(2b/p)), b = 4
        assert rows[k].cuckoo_fp_bits == math.ceil(math.log2(8 / p))
        # pow2 bucket count covering n at 95% load, 4 slots
        assert rows[k].cuckoo_buckets * 4 * 0.95 >= n
        assert rows[k].cuckoo_buckets & (rows[k].cuckoo_buckets - 1) == 0
    # monotone: tighter FPR costs more bits, never fewer hashes
    assert rows[2].bloom_bits < rows[3].bloom_bits < rows[4].bloom_bits
    assert rows[2].bloom_hashes <= rows[3].bloom_hashes <= rows[4].bloom_hashes
