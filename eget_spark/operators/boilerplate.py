"""Host-scoped boilerplate template detection and removal.

Corpus-wide line dedup (operators/line_dedup.py) keeps ONE occurrence
of every duplicated line; template removal is the complementary
extraction tool: a line that appears on a large FRACTION of one host's
pages is site chrome (nav labels, cookie banners, footers) and should
be dropped from EVERY page of that host — including its first
occurrence — while the same words on another host are left alone.
This is the host-level boilerplate rule from the CCNet / RefinedWeb
lineage (Wenzek et al. 2019; Penedo et al. 2023 — public papers),
scoped per pay-level domain instead of per corpus shard.

Exact semantics (pinned so the DuckDB oracle reproduces them):

- a page's lines are ``split(text, '\\n')``; a line is blank when the
  engine ``trim`` (ASCII-space trim) empties it; blank lines are never
  template candidates and always survive;
- a non-blank line is counted ONCE per page (``n_pages`` = distinct
  pages of the host containing it, not occurrences);
- host eligibility: hosts with fewer than ``min_pages`` pages have no
  templates (a 2-page host would otherwise flag half its content);
- template rule: ``n_pages >= ceil(frac * host_pages)`` — integer
  arithmetic, no float threshold ambiguity;
- per host at most ``max_templates`` lines are templates, ranked by
  (n_pages desc, line asc) — the cap bounds the broadcast set below
  and the tiebreak is total, so both engines pick identical sets;
- every occurrence of a template line is dropped from that host's
  pages (first included); surviving lines reassemble in original index
  order joined with ``\\n``.

Output: (id, host, text, n_lines, n_dropped).

Scale shape (the 100 TB story): the decision table is tiny — at most
``max_templates`` rows per QUALIFYING host — so the corpus itself
never shuffles to apply it.  Detection is one explode +
map-side-combined groupBy(host, line) (a template line occurring on
10^6 pages collapses per map task before the shuffle, because the
count is the aggregate itself — same argument as line_dedup) + one
per-host top-k window over host-line COUNTS (cardinality: distinct
lines, not occurrences).  Application collects templates per host
into an array (<= max_templates elements) and broadcast-joins on host;
each exploded line does an ``array_contains`` against <=
``max_templates`` strings — no shuffle of the exploded corpus on line
text, which is exactly the hot key a join-on-line would create.
Reassembly is the one groupBy(id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exploded_lines(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(host, id, line) — the pinned line explode (engine trim blanks
    dropped); shared by batch detection and the streaming maintainer so
    the two can never drift."""
    return df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).where(F.trim(F.col("line")) != "")


def template_decision(
    per_line: DataFrame,
    host_pages: DataFrame,
    frac: float = 0.5,
    min_pages: int = 5,
    max_templates: int = 50,
) -> DataFrame:
    """The pinned candidate->template rule over already-aggregated counts
    ((host, line, n_pages) x (host, host_pages)) — the ONE copy of the
    min_pages gate, the ceil(frac*host_pages) threshold, and the
    (n_pages desc, line asc) top-k; batch host_templates and the
    streaming maintainer's read_templates both call it, so the
    stream==batch contract can't be broken by a one-sided edit."""
    cand = (
        per_line.join(host_pages, "host")
        .where(F.col("host_pages") >= F.lit(min_pages))
        # integer threshold: n_pages >= ceil(frac * host_pages)
        .where(
            F.col("n_pages")
            >= F.ceil(F.lit(float(frac)) * F.col("host_pages")).cast("long")
        )
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_pages").desc(), F.col("line").asc()
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.lit(max_templates))
        .select("host", "line", "n_pages", "host_pages")
    )


def host_templates(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    frac: float = 0.5,
    min_pages: int = 5,
    max_templates: int = 50,
) -> DataFrame:
    """(host, line, n_pages, host_pages) template lines per host."""
    lines = exploded_lines(df, host_col, id_col, text_col)
    # distinct (host, id, line): a line repeated within one page counts once
    per_line = (
        lines.distinct()
        .groupBy("host", "line")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    host_pages = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("host_pages")
    )
    return template_decision(
        per_line, host_pages, frac, min_pages, max_templates
    )


def strip_templates(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    frac: float = 0.5,
    min_pages: int = 5,
    max_templates: int = 50,
    broadcast_templates: bool = True,
) -> DataFrame:
    """(id, host, text, n_lines, n_dropped) with each host's template
    lines removed from every one of its pages.

    ``broadcast_templates``: the decision table is <= max_templates
    rows per qualifying (>= min_pages) host, so broadcasting it keeps
    the exploded corpus un-shuffled — a host-keyed shuffle would send a
    10^7-page host's every line to one reducer.  If the qualifying-host
    count itself is extreme (hundreds of millions), pass False to let
    the planner shuffle the join with AQE skew-splitting instead."""
    tmpl = host_templates(
        df, host_col, id_col, text_col, frac, min_pages, max_templates
    )
    tmpl_sets = tmpl.groupBy("host").agg(
        F.array_sort(F.collect_set("line")).alias("_tmpl")
    )
    if broadcast_templates:
        tmpl_sets = F.broadcast(tmpl_sets)
    lines = df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    marked = lines.join(tmpl_sets, "host", "left").withColumn(
        "_drop",
        F.when(F.trim(F.col("line")) == "", F.lit(False)).otherwise(
            F.coalesce(F.array_contains("_tmpl", F.col("line")), F.lit(False))
        ),
    )
    reassembled = marked.groupBy("host", "id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("_drop"), F.struct("idx", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.sum(F.when(F.col("_drop"), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
        (F.count(F.lit(1)) - F.sum(F.when(F.col("_drop"), 1).otherwise(0)))
        .cast("long")
        .alias("n_lines"),
    )
    return reassembled.select("id", "host", "text", "n_lines", "n_dropped")
