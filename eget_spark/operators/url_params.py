"""Irrelevant-URL-parameter detection: which query params change content?

Crawl-engine extension (no single reference operator; the reference's
cache key hashes the full URL, services/cache — so two URLs differing
only in a session-id param fetch twice): production crawlers learn
which query parameters are CONTENT-IRRELEVANT (session ids, tracking
tags, sort orders that 301 back) and strip them at admission, collapsing
entire URL families before fetch.  The evidence is already in the crawl
store: URLs sharing a base but differing in one param's VALUE, whose
fetched content fingerprints nonetheless agree.

Pinned semantics (engine-exact, integer-only):

- ``base`` = the URL with its query string and fragment removed;
- each URL contributes its parsed ``(name, value)`` query params
  (params split on ``&``, name/value on the FIRST ``=``; bare names get
  value ``''``);
- evidence groups on ``(base, name, others)`` where ``others`` = the
  REMAINING params sorted and re-joined — the controlled experiment:
  within a group only THIS param's value varies, so a fingerprint
  change is attributable to it (grouping on (base, name) alone would
  blame this param for content changes another param caused);
- a group with >= 2 DISTINCT values is *irrelevant evidence* iff its
  URLs carry exactly 1 DISTINCT content fingerprint;
- per param name: ``n_bases`` = #groups with >=2 distinct values,
  ``n_irrelevant`` = #those groups where content didn't vary,
  ``irrelevant_permille = (1000 * n_irrelevant) // n_bases``.

A name with high ``irrelevant_permille`` across many bases is a strip
candidate (Google Search Console's old "URL parameters" tool semantics).

Scale shape (100 TB): one explode to (base, name, others, value, fp)
rows, then two map-side-combined aggregates — groupBy(base, name,
others) with distinct counts, then groupBy(name).  Grouping keys
include the base, so a hot site spreads across its bases; no self-join,
no window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def param_relevance(
    df: DataFrame, url_col: str, fp_col: str
) -> DataFrame:
    """(name, n_bases, n_irrelevant, irrelevant_permille) per query-param
    name, over (url, content-fingerprint) rows.  Only bases where the
    param's value actually VARIES count as evidence either way."""
    base = F.regexp_replace(F.col(url_col), r"[?#].*$", "")
    qry = F.regexp_extract(F.col(url_col), r"\?([^#]*)", 1)
    params = F.filter(F.split(qry, "&"), lambda p: p != "")
    pairs = df.select(
        base.alias("base"),
        F.col(fp_col).alias("fp"),
        params.alias("_ps"),
        F.explode(params).alias("kv"),
    ).select(
        "base",
        "fp",
        F.regexp_extract("kv", r"^([^=]*)", 1).alias("name"),
        F.regexp_replace("kv", r"^[^=]*=?", "").alias("value"),
        F.array_join(
            F.array_sort(
                F.filter("_ps", lambda p: p != F.col("kv"))
            ),
            "&",
        ).alias("others"),
    )
    per_base = pairs.groupBy("base", "name", "others").agg(
        F.countDistinct("value").alias("_nv"),
        F.countDistinct("fp").alias("_nfp"),
    )
    varied = per_base.where(F.col("_nv") >= 2)
    return (
        varied.groupBy("name")
        .agg(
            F.count("*").cast("long").alias("n_bases"),
            F.sum((F.col("_nfp") == 1).cast("long"))
            .cast("long")
            .alias("n_irrelevant"),
        )
        .withColumn(
            "irrelevant_permille",
            F.expr("1000 * n_irrelevant div n_bases").cast("long"),
        )
    )


PARAM_RELEVANCE_ORACLE_SQL = """
WITH pairs AS (
  SELECT regexp_replace(url, '[?#].*$', '') AS base,
         fp,
         regexp_extract(kv, '^([^=]*)', 1) AS name,
         regexp_replace(kv, '^[^=]*=?', '') AS value,
         array_to_string(
           list_sort(list_filter(ps, p -> p <> kv)), '&') AS others
  FROM (
    SELECT url, fp, ps, unnest(ps) AS kv
    FROM (
      SELECT url, fp,
             list_filter(
               string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
               p -> p <> '') AS ps
      FROM {src}
    )
  )
),
per_base AS (
  SELECT base, name, others,
         count(DISTINCT value) AS nv, count(DISTINCT fp) AS nfp
  FROM pairs GROUP BY base, name, others
)
SELECT name,
       CAST(count(*) AS BIGINT) AS n_bases,
       CAST(sum(CASE WHEN nfp = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_irrelevant,
       CAST((1000 * sum(CASE WHEN nfp = 1 THEN 1 ELSE 0 END)) // count(*)
         AS BIGINT) AS irrelevant_permille
FROM per_base WHERE nv >= 2 GROUP BY name
"""
