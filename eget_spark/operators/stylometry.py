"""Burrows' Delta stylistic distance between corpus sources.

Burrows ("'Delta': a Measure of Stylistic Difference and a Guide to
Likely Authorship", LLC 2002): take the corpus's top-k most-frequent
words (overwhelmingly function words), express each group's usage of
each word as a z-score across groups, and measure the mean absolute
z-difference between two groups.  Because function-word rates are
topic-blind and length-robust, Delta fingerprints the GENERATOR of the
text rather than its subject — for a crawl corpus that means template
farms, mirror networks, and machine-spun content clusters surface as
near-zero Delta between nominally unrelated sources, the stylistic
companion to q263's unigram JSD (which sees topical vocabulary, not
style) and q247's WL structural colors (which see link topology, not
text).

Pinned semantics (the micro-unit discipline — every cross-row sum is
exact int64, transcendental-free):
- tokens under the engine-wide TOKEN_SPLIT pin; the word panel is the
  global top-``k`` by total count (ties break on the token, via
  TakeOrdered — no window);
- per (group, word) relative frequency in exact ppm:
  ``f_ppm = cnt * 1e6 DIV n_group`` over the FULL group token count,
  with absent words an explicit 0 row (the grid join below);
- per word across the S groups: ``num = S*f_ppm - sum_f`` and
  ``varnum = S*sum_f2 - sum_f^2`` are exact int64 moments; the
  population z-score is the single pinned double expression
  ``z_micro = round(1e6 * num / sqrt(varnum))`` (sqrt and divide are
  IEEE-correctly-rounded, so identical integer inputs give identical
  doubles in every engine — no transcendental anywhere);
- words with ``varnum = 0`` (identical rate in every group) carry no
  stylistic signal and are excluded GLOBALLY, so every pair averages
  over the same panel;
- ``delta_micro = sum(|z_a - z_b|) DIV n_words`` — exact int64 again.

Scale shape (100 TB): one explode -> map-side-combined (group, word)
count; the word panel is k rows (TakeOrderedAndProject, driver-bounded
at k), the grid is S*k rows, and every join after the token rollup is
broadcast-class (panel or grid side).  The pair join is over the
k-row-per-group profile table — S^2*k rows total, group-count-bounded,
never corpus-sized.  No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def burrows_delta(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """(source_a, source_b, n_words, delta_micro) for every unordered
    group pair (a < b), ascending — small Delta = same stylistic
    fingerprint."""
    from eget_spark.operators.lm_score import TOKEN_SPLIT

    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    gw = toks.groupBy("grp", "tok").agg(
        F.count("*").cast("long").alias("cnt")
    )
    totals = gw.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("n_grp")
    )
    panel = (
        gw.groupBy("tok")
        .agg(F.sum("cnt").cast("long").alias("tot"))
        .orderBy(F.col("tot").desc(), F.col("tok").asc())
        .limit(int(k))
        .select("tok")
    )
    # explicit zero rows: every (group, panel word) cell exists
    grid = totals.crossJoin(F.broadcast(panel))
    cells = (
        grid.join(F.broadcast(panel.join(gw, "tok")), ["grp", "tok"], "left")
        .select(
            "grp",
            "tok",
            F.expr(
                "coalesce(cnt, CAST(0 AS BIGINT)) * CAST(1000000 AS BIGINT)"
                " DIV n_grp"
            ).alias("f_ppm"),
        )
    )
    stats = cells.groupBy("tok").agg(
        F.count("*").cast("long").alias("s"),
        F.sum("f_ppm").cast("long").alias("sum_f"),
        F.sum(F.col("f_ppm") * F.col("f_ppm")).cast("long").alias("sum_f2"),
    )
    prof = (
        cells.join(F.broadcast(stats), "tok")
        .where(F.expr("s * sum_f2 - sum_f * sum_f > 0"))
        .select(
            "grp",
            "tok",
            F.expr(
                "CAST(round(1e6 * CAST(s * f_ppm - sum_f AS DOUBLE)"
                " / sqrt(CAST(s * sum_f2 - sum_f * sum_f AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("z_micro"),
        )
    )
    a = prof.select(
        F.col("grp").alias("source_a"),
        "tok",
        F.col("z_micro").alias("za"),
    )
    b = prof.select(
        F.col("grp").alias("source_b"),
        "tok",
        F.col("z_micro").alias("zb"),
    )
    pairs = a.join(b, "tok").where(F.col("source_a") < F.col("source_b"))
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.expr(
                "sum(abs(za - zb)) DIV count(*)"
            ).cast("long").alias("delta_micro"),
        )
        .orderBy("source_a", "source_b")
    )
