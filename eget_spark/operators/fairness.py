"""Crawl-equity metrics: Gini concentration of fetches across hosts.

Crawl-engine extension (no single reference operator; the reference's
metrics service reports totals only — app/services): a polite crawler
wants ONE number tracking whether its fetch budget is spreading across
sites or piling onto a few hot hosts — the standard concentration
measure is the Gini coefficient of the per-host fetch-count
distribution (0 = perfectly even, ->1 = one host takes everything).
Operations teams alarm on drift of this number between crawl rounds
(a rising Gini means politeness budgets or trap throttles are failing).

Pinned semantics (engine-exact, integer-only — the classic rank form of
Gini, exact for discrete counts, no floats ever):

- x_1 <= ... <= x_n = per-key counts sorted ASCENDING, ties broken by
  key string ascending (determinism pin; ties don't change the value —
  equal x swap equal terms — but the pin makes the plan reproducible);
- ``gini_permille = (2 * sum(i * x_i) - (n + 1) * sum(x)) * 1000
  // (n * sum(x))``, 1-based ranks, int64 floor division;
- n == 0 -> empty result; sum(x) == 0 -> gini_permille = 0 (pin).

Scale shape (100 TB): the raw table first compacts to (key, count) via
one map-side-combined aggregate — everything downstream is |keys|-sized.
The exact global rank uses operators/sequence.with_global_seq (range
exchange + partitioned rank + broadcast prefix offsets — never a
single-partition window), so 10^8 hosts still rank in parallel.  The
final reduction is a scalar aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sequence import with_global_seq


def fairness_gini(df: DataFrame, key_col: str) -> DataFrame:
    """One row (n_keys, total, gini_permille) over the per-``key_col``
    row-count distribution of ``df``."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("x")
    )
    res = with_global_seq(counts, ["x", "key"], start=1, seq_col="_i")
    out = (
        res.df.agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("x").cast("long").alias("total"),
            F.sum(F.col("_i") * F.col("x")).cast("long").alias("_ixs"),
        )
        .select(
            "n_keys",
            "total",
            F.when(F.col("total") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(2 * _ixs - (n_keys + 1) * total) * 1000"
                    " div (n_keys * total)"
                )
            )
            .cast("long")
            .alias("gini_permille"),
        )
        .localCheckpoint()
    )
    res.unpersist()
    return out


FAIRNESS_GINI_ORACLE_SQL = """
WITH counts AS (
  SELECT {key} AS key, CAST(count(*) AS BIGINT) AS x
  FROM {src} GROUP BY 1
),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, key) AS i FROM counts
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(x) AS BIGINT) AS total,
       CAST(CASE WHEN sum(x) = 0 THEN 0
            ELSE (2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000
                 // (count(*) * sum(x)) END AS BIGINT) AS gini_permille
FROM ranked
"""


def diversity_indices(df: DataFrame, key_col: str) -> DataFrame:
    """Ecological diversity indices of a categorical mix (Shannon 1948;
    Simpson, Nature 1949; Berger & Parker 1970) — the source-diversity
    health check a training corpus gets alongside the Gini above: a
    crawl can be Gini-fair across hosts yet still concentrate 90% of
    TOKENS in one source family; these three numbers say how many
    EFFECTIVE sources the mix really has.

    One row over the per-``key_col`` row-count distribution:

    - ``richness``: distinct keys;
    - ``shannon_micro``: H = -sum p_i ln p_i in int64 micro-nats, each
      group's term quantized BEFORE the sum (the q226 discipline —
      p_i = n_i/N is a ratio of exact integers, so the per-term double
      is engine-identical);
    - ``eff_sources``: exp(H) (Hill number q=1, MacArthur's effective
      species count) from the QUANTIZED H — rounded 6;
    - ``simpson_permicro``: Simpson concentration with the unbiased
      finite-sample form ``sum n_i(n_i-1) * 1e6 // (N(N-1))`` — pure
      int64 (1e6 units); diversity is its complement;
    - ``berger_parker_micro``: ``max(n_i) * 1e6 // N`` — dominance of
      the single largest source, int64.

    Scale shape: ONE map-side-combined count per key, a 1-row broadcast
    of N, per-group arithmetic, ONE scalar reduction.  No window, no
    Python.  N(N-1) overflows int64 past N ~ 3e9 rows — compact to
    (key, count) upstream and feed counts if the raw table is larger
    (the counts themselves stay exact)."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").cast("long").alias("n")
    )
    tot = counts.agg(F.sum("n").cast("long").alias("n_tot"))
    per = counts.crossJoin(F.broadcast(tot)).select(
        "n",
        "n_tot",
        F.round(
            F.lit(-1e6)
            * (F.col("n").cast("double") / F.col("n_tot").cast("double"))
            * F.log(F.col("n").cast("double") / F.col("n_tot").cast("double")),
            0,
        )
        .cast("long")
        .alias("h_term"),
        (F.col("n") * (F.col("n") - 1)).cast("long").alias("n2"),
    )
    return per.groupBy("n_tot").agg(
        F.count("*").cast("long").alias("richness"),
        F.sum("h_term").cast("long").alias("shannon_micro"),
        F.sum("n2").cast("long").alias("_sn2"),
        F.max("n").cast("long").alias("_maxn"),
    ).select(
        "richness",
        "shannon_micro",
        F.round(F.exp(F.col("shannon_micro").cast("double") / 1e6), 6).alias(
            "eff_sources"
        ),
        F.when(
            F.col("n_tot") > 1,
            F.expr("(_sn2 * 1000000) div (n_tot * (n_tot - 1))"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("simpson_permicro"),
        F.expr("(_maxn * 1000000) div n_tot").cast("long").alias(
            "berger_parker_micro"
        ),
    )
