"""DUST rule mining: learn content-irrelevant URL parameters from evidence.

"Do not crawl in the DUST" (Bar-Yossef, Keidar, Schonfeld, WWW 2007):
Different URLs with Similar Text waste crawl budget and poison dedup
statistics.  The mineable subfamily — parameter-strip rules ("?sid=… never
changes the page") — is learned here from the crawl's own output: a rule
``strip key k`` is SUPPORTED by URL u when the corpus also contains u with
all k-params removed AND both carry identical content; it is VIOLATED when
the stripped URL exists with different content.  Validated rules feed URL
canonicalization (functions/urls) so future crawls never fetch the
duplicates at all — this is the evidence-driven upgrade of the q152 param
audit (which flags suspicious params but never cross-checks the stripped
URL's actual content).

Pinned semantics (engine-portable, oracle-checked):
- fragment (``#…``) is stripped, then query = substring after the first
  ``?``; params = non-empty ``&``-split items; a param's KEY = the part
  before its first ``=``;
- candidate pairs = (url, k) for each DISTINCT key k among the URL's
  params; stripped(u, k) = base plus the remaining params in original
  order (no ``?`` if none remain);
- the corpus is compacted to ONE row per URL before anything else: a URL
  observed with multiple content keys (content drift across refetches —
  arbitrated upstream by the recrawl operators) resolves to its MINIMUM
  key, so both the candidate side and the lookup side stay url-unique
  and the join can never fan out;
- support / violation / missing as above over that compacted corpus;
  ``valid = n_violate == 0 AND n_support >= min_support``.

Scale shape: one distinct compaction; ONE explode bounded by the URL's
distinct param-key count (single digits); the stripped-URL lookup is ONE
equi-join on a uniform url-string key (no fan-out: both sides unique);
final rollup is a map-side-combined groupBy on the key.  No window, no
Python, no self-cross-join — at 10^10 URLs the cost is the one url-keyed
shuffle the dedup pipeline already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dust_param_rules(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "content_key",
    min_support: int = 2,
) -> DataFrame:
    """Returns (param_key, n_candidates, n_support, n_violate, n_missing,
    valid) — one row per query-param key observed anywhere in the corpus."""
    u = (
        df.select(F.col(url_col).alias("url"), F.col(content_col).alias("ck"))
        .groupBy("url")
        .agg(F.min("ck").alias("ck"))
    )

    base = F.split(F.split(F.col("url"), "#", 2).getItem(0), r"\?", 2)
    path = base.getItem(0)
    query = F.coalesce(
        F.when(F.size(base) > 1, base.getItem(1)), F.lit("")
    )
    params = F.filter(F.split(query, "&"), lambda x: x != F.lit(""))
    keys = F.array_distinct(
        F.transform(params, lambda x: F.split(x, "=", 2).getItem(0))
    )
    cand = (
        u.withColumn("_path", path)
        .withColumn("_params", params)
        .withColumn("param_key", F.explode(keys))
    )
    remaining = F.filter(
        F.col("_params"),
        lambda x: F.split(x, "=", 2).getItem(0) != F.col("param_key"),
    )
    stripped = F.when(
        F.size(remaining) > 0,
        F.concat(F.col("_path"), F.lit("?"), F.array_join(remaining, "&")),
    ).otherwise(F.col("_path"))
    cand = cand.select("url", "ck", "param_key", stripped.alias("_stripped"))

    target = u.select(
        F.col("url").alias("_stripped"), F.col("ck").alias("_ck2")
    )
    joined = cand.join(target, "_stripped", "left")
    return (
        joined.groupBy("param_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(
                F.when(F.col("_ck2").isNotNull() & (F.col("_ck2") == F.col("ck")), 1).otherwise(0)
            ).cast("long").alias("n_support"),
            F.sum(
                F.when(F.col("_ck2").isNotNull() & (F.col("_ck2") != F.col("ck")), 1).otherwise(0)
            ).cast("long").alias("n_violate"),
            F.sum(
                F.when(F.col("_ck2").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_missing"),
        )
        .withColumn(
            "valid",
            (F.col("n_violate") == 0)
            & (F.col("n_support") >= F.lit(int(min_support))),
        )
    )
