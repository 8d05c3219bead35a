"""Repetition-based quality rules (Gopher/MassiveText-style filters).

Large-scale training-data pipelines drop documents dominated by repeated
content — boilerplate navigation, scraped templates, degenerate
generations.  The canonical signals (Rae et al., "Scaling Language
Models: ... Gopher", 2021, Table A1 — public paper) are the fraction of
the document duplicated at line granularity and the share of characters
covered by its most frequent word n-gram.  This module computes three of
them relationally so they run at corpus scale:

- ``dup_line_frac``     — duplicated lines / total lines
- ``dup_line_char_frac``— characters in duplicated lines / total line chars
- ``top_bigram_char_frac`` — characters covered by the most frequent word
  bigram (count x bigram length) / total characters of text

Exact definitions (pinned so the DuckDB oracle reproduces them):
lines are ``\\n``-split segments whose ``trim`` is non-empty (engine
``trim`` = ASCII-space trim in both Spark and DuckDB — a tab-only line
counts as non-empty); a line is
"duplicated" when its exact text occurs more than once in the document
(ALL its occurrences count as duplicated, Gopher's accounting); words
are ``\\s+``-split non-empty tokens; the top bigram is chosen by
(count DESC, bigram ASC) so ties break identically in any engine; the
bigram's covered characters use its single-space joined length.

Scale shape: two explode->groupBy aggregations keyed on (doc_id, line) /
(doc_id, bigram) — uniform hash shuffles partitioned by document content,
no skewed keys beyond pathological single-doc repetition (bounded by doc
length), no Python anywhere (codegen end to end), and the final joins are
on doc_id.  At 100 TB each signal is one shuffle of the exploded
representation, the same cost class as the shingle/minhash pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def line_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(id, n_lines, dup_line_frac, dup_line_char_frac) per document.

    ``sep`` is the segment delimiter (a regex): ``"\\n"`` gives Gopher's
    duplicated-LINE fractions, ``"\\n\\n+"`` its duplicated-PARAGRAPH
    fractions — the same accounting at both granularities.  Documents
    with no non-empty segments get 0.0 fractions (kept, not dropped —
    the length filters handle empty docs)."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), sep)).alias("line"),
    ).where(F.trim(F.col("line")) != "")
    per_line = lines.groupBy("id", "line").agg(F.count("*").alias("cnt"))
    per_line = per_line.withColumn("chars", F.length("line") * F.col("cnt"))
    agg = per_line.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
            / F.sum("cnt"),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("chars")).otherwise(0))
            / F.sum("chars"),
            6,
        ).alias("dup_line_char_frac"),
    )
    return _fill_lines(df.select(F.col(id_col).alias("id")), agg)


def _fill_lines(base, agg):
    return base.join(agg, "id", "left").select(
        "id",
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
        F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("dup_line_char_frac"),
    )


def top_bigram_coverage(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, top_bigram, top_bigram_n, top_bigram_char_frac) per document.

    Coverage = count(top bigram) * length(bigram joined with one space)
    / length(text).  Documents with fewer than two words get NULL bigram
    and 0.0 coverage."""
    return _fill_top(
        df.select(F.col(id_col).alias("id")), _top_agg(df, id_col, text_col)
    )


def _words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).alias("text_len"),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
        ).alias("ws"),
    )


def _gram_array(n: int):
    """Array of space-joined word n-grams of ``ws`` (empty when <n words).

    Guard: Spark's sequence(0, -1) counts DOWN, so docs with <n words
    must short-circuit to an empty array (explode then yields no rows and
    such docs fall out until the left join back)."""
    return F.when(
        F.size("ws") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - F.lit(n)),
            lambda i: F.array_join(F.slice(F.col("ws"), i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_agg(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, prefix: str = "top_bigram"
) -> DataFrame:
    words = _words(df, id_col, text_col)
    grams = words.select(
        "id", "text_len", F.explode(_gram_array(n)).alias("gram")
    )
    counted = grams.groupBy("id", "text_len", "gram").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("gram"))
    return (
        counted.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "id",
            F.col("gram").alias(prefix),
            F.col("n").cast("long").alias(f"{prefix}_n"),
            F.round(
                F.col("n") * F.length("gram") / F.col("text_len"), 6
            ).alias(f"{prefix}_char_frac"),
        )
    )


def top_ngram_coverage(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """(id, top_ngram, top_ngram_n, top_ngram_char_frac) per document —
    the Gopher top word-n-gram character-coverage signal for any n (the
    paper removes on the top 2/3/4-gram; the bigram wrapper keeps q57's
    column names).  Coverage = count(top gram) * length(gram joined with
    one space) / length(text); ties break (count DESC, gram ASC); docs
    with <n words get NULL gram and 0.0 coverage."""
    top = _top_agg(df, id_col, text_col, n=n, prefix="top_ngram")
    base = df.select(F.col(id_col).alias("id"))
    return base.join(top, "id", "left").select(
        "id",
        "top_ngram",
        F.coalesce("top_ngram_n", F.lit(0)).alias("top_ngram_n"),
        F.coalesce("top_ngram_char_frac", F.lit(0.0)).alias(
            "top_ngram_char_frac"
        ),
    )


def dup_ngram_char_frac(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, n_words, dup_ngram_char_frac) — Gopher's duplicated word
    n-gram CHARACTER coverage: the fraction of word characters covered by
    any n-gram occurring more than once IN the document, each covered
    word counted once however many duplicated grams overlap it (the
    position-cover accounting the dup-5..10-gram rules of Table A1 use).

    Pinned: words are ``\\s+``-split non-empty tokens; the denominator is
    the sum of word lengths (whitespace does not count on either side of
    the ratio); docs with <n words (or no duplicated grams) get 0.0.

    Scale shape: one explode->groupBy(id, gram) count (map-side combined,
    keys bounded by doc content), duplicated grams' position lists fold
    back to ONE covered-index array per doc (groupBy(id) over gram rows),
    and the char accounting is a higher-order aggregate against the doc's
    own word array — no per-token shuffle, no Python."""
    words = _words(df, id_col, text_col).select(
        "id",
        "ws",
        F.size("ws").cast("long").alias("n_words"),
        F.aggregate(
            F.col("ws"), F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("wchars"),
    )
    grams = words.select("id", F.posexplode(_gram_array(n)).alias("pos", "gram"))
    dup = (
        grams.groupBy("id", "gram")
        .agg(F.count("*").alias("cnt"), F.collect_list("pos").alias("ps"))
        .where(F.col("cnt") > 1)
    )
    cover = dup.groupBy("id").agg(
        F.array_distinct(
            F.flatten(
                F.collect_list(
                    F.flatten(
                        F.transform(
                            "ps", lambda p: F.sequence(p, p + F.lit(n - 1))
                        )
                    )
                )
            )
        ).alias("covered")
    )
    covered_chars = F.aggregate(
        F.col("covered"),
        F.lit(0).cast("long"),
        lambda acc, ti: acc + F.length(F.element_at(F.col("ws"), ti + 1)),
    )
    return words.join(cover, "id", "left").select(
        "id",
        "n_words",
        F.when(
            F.col("covered").isNotNull() & (F.col("wchars") > 0),
            F.round(covered_chars / F.col("wchars"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_char_frac"),
    )


def _fill_top(base, top):
    # carries every base column (the id table, or the line-signal table
    # when composing repetition_signals) plus the filled bigram columns
    return base.join(top, "id", "left").select(
        *base.columns,
        "top_bigram",
        F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
        F.coalesce("top_bigram_char_frac", F.lit(0.0)).alias(
            "top_bigram_char_frac"
        ),
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """All repetition quality signals joined on the document id — the
    Gopher-filter input table (thresholds are the caller's policy; the
    paper uses e.g. dup_line_frac > 0.30 or top-2gram coverage > 0.20 as
    removal rules).  The line table (already id-complete from its own
    fill) serves as the join base for the bigram aggregate, so the
    combined signal needs three corpus scans, not four."""
    return _fill_top(
        line_repetition(df, id_col, text_col), _top_agg(df, id_col, text_col)
    )


# The eight "must contain two of" stop words from Gopher Table A1
# (Rae et al. 2021, public paper).  Sorted so cross-engine list
# comparisons are order-independent by construction.
GOPHER_STOPWORDS = ["and", "be", "have", "of", "that", "the", "to", "with"]

_BULLETS = ("- ", "* ", "•")  # dash/star require a following space
_ELLIPSES = ("...", "…")


def gopher_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The non-repetition Gopher/MassiveText document filters (Rae et al.
    2021, Table A1) as ONE zero-shuffle column-expression pass — every
    signal is a higher-order array function over the words/lines of the
    document, so the whole operator is a scan-side projection (no
    Exchange, no Python, whole-stage codegen end to end; the repetition
    signals, which genuinely need shuffles, live in
    :func:`repetition_signals`).

    Pinned definitions (so the DuckDB oracle reproduces them exactly):

    - words  = ``\\s+``-split non-empty tokens of the raw text
    - lines  = ``\\n``-split segments, ASCII-space-trimmed, non-empty
    - ``n_words``          — word count (Gopher keeps 50..100,000)
    - ``mean_word_len``    — sum(len(word))/n_words (keeps 3..10)
    - ``alpha_word_frac``  — words containing ``[A-Za-z]`` / n_words
      (keeps >= 0.80)
    - ``symbol_word_ratio``— (# count + non-overlapping ``...`` count +
      ``…`` count) / n_words (keeps <= 0.10); the ellipsis count is
      replace-based, i.e. ``....`` counts once
    - ``bullet_line_frac`` — trimmed lines starting with ``- ``/``* ``/
      ``•`` / lines (keeps <= 0.90)
    - ``ellipsis_line_frac`` — trimmed lines ending with ``...`` or
      ``…`` / lines (keeps <= 0.30)
    - ``stopword_hits``    — DISTINCT members of the 8-word Gopher stop
      list present among lowercased words (keeps >= 2)
    - ``gopher_pass``      — the conjunction of all seven rules above

    Documents with no words (or no lines) get 0.0 for the affected
    fractions and fail ``gopher_pass`` via the word-count floor."""
    text = F.col(text_col)
    ws = F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))
    # NB: an explicit one-arg lambda — passing F.trim directly would let
    # transform bind its (element, index) pair to trim's deprecated
    # two-parameter (str, trimStr) signature
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n_words = F.size(ws)
    n_lines = F.size(lines)

    def frac(num, den):
        return F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))

    word_chars = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#")))
    ell3 = (
        F.length(text) - F.length(F.replace(text, F.lit("...")))
    ) / F.lit(3)
    ell1 = F.length(text) - F.length(F.replace(text, F.lit("…")))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: l.startswith(F.lit(_BULLETS[0]))
            | l.startswith(F.lit(_BULLETS[1]))
            | l.startswith(F.lit(_BULLETS[2])),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: l.endswith(F.lit(_ELLIPSES[0]))
            | l.endswith(F.lit(_ELLIPSES[1])),
        )
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(ws, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )

    out = df.select(
        F.col(id_col).alias("id"),
        n_words.cast("long").alias("n_words"),
        frac(word_chars, n_words).alias("mean_word_len"),
        frac(alpha_words, n_words).alias("alpha_word_frac"),
        frac(hash_count + ell3 + ell1, n_words).alias("symbol_word_ratio"),
        frac(bullet_lines, n_lines).alias("bullet_line_frac"),
        frac(ellipsis_lines, n_lines).alias("ellipsis_line_frac"),
        stop_hits.cast("int").alias("stopword_hits"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("stopword_hits") >= 2),
    )


def domain_quality_rollup(
    df: DataFrame,
    domain_col: str,
    quality_col: str,
    low_threshold: float = 0.55,
) -> DataFrame:
    """Per-registrable-domain quality rollup → blocklist candidates (the
    RefinedWeb/C4 curation step: drop or down-weight whole domains whose
    aggregate quality is poor, instead of re-judging every page).

    Exact semantics (pinned, cross-engine bit-exact): each doc's quality
    (already round(,6)) is converted to integer MICRO-units
    (round(q*1e6) as int64) so the per-domain sum is an exact integer —
    never an order-dependent double sum; avg_quality = round(sum_micro /
    n / 1e6, 6); low_quality flags avg < low_threshold.

    Scale shape: ONE map-side-combined groupBy(domain) over int64
    partials; domain cardinality (millions) is tiny next to pages."""
    q_micro = F.round(F.col(quality_col) * F.lit(1000000.0), 0).cast("long")
    avg = F.round(
        F.col("sum_quality_micro")
        / F.col("n_docs")
        / F.lit(1000000.0),
        6,
    )
    return (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(q_micro).cast("long").alias("sum_quality_micro"),
        )
        .select(
            "domain",
            "n_docs",
            "sum_quality_micro",
            avg.alias("avg_quality"),
            (avg < F.lit(float(low_threshold))).alias("low_quality"),
        )
    )


def adaptive_quality_filter(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    num: int = 1,
    den: int = 10,
) -> DataFrame:
    """Adaptive (percentile-based) quality filtering — the FineWeb-style
    curation step: instead of one global cutoff, each group (language,
    source) drops its own bottom num/den score fraction, so low-resource
    languages aren't wiped out by an English-tuned threshold.

    Exact semantics (pinned): cutoff(group) = the ceil(n*num/den)-th
    score in (score asc, id asc) order — the same rank arithmetic as
    operators/quantiles.exact_quantiles; keep = score >= cutoff.
    Returns (id, group, score, cutoff, keep) for every input row.

    Scale shape: ONE window shuffle on the group key computes ranks and
    cutoffs; the cutoff table is |groups| rows and BROADCASTS back onto
    the corpus — no second corpus shuffle."""
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy(group_col).orderBy(F.col(score_col), F.col(id_col))
    wn = _W.partitionBy(group_col)
    ranked = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("group"),
        F.col(score_col).alias("score"),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(wn).alias("_n"),
    )
    target = F.floor((F.col("_n") * num + (den - 1)) / F.lit(den)).cast("long")
    cuts = (
        ranked.where(F.col("_rn") == target)
        .groupBy("group")
        .agg(F.max("score").alias("cutoff"))
    )
    # null-safe group match: a NULL group is a real partition (it got a
    # rank and a cutoff above) — a plain equi join would silently drop
    # its rows from the output, violating the every-input-row contract
    rows = ranked.select("id", "group", "score")
    return (
        rows.join(
            F.broadcast(cuts.withColumnRenamed("group", "_cg")),
            rows["group"].eqNullSafe(F.col("_cg")),
        )
        .select(
            "id", "group", "score", "cutoff",
            (F.col("score") >= F.col("cutoff")).alias("keep"),
        )
    )


def compression_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    level: int = 6,
) -> DataFrame:
    """Compression-ratio quality signal (RefinedWeb/Gopher family):
    templated/repetitive pages deflate far below natural prose, so
    ``ratio_permille = deflate_len * 1000 div raw_len`` separates spam
    mills and boilerplate farms from content.

    zlib at a FIXED level over utf-8 bytes is deterministic (same bytes
    in, same bytes out, any platform shipping standard zlib), so the
    signal is reproducible across retries and partitionings; there is no
    SQL-expressible oracle (DEFLATE is not relational), making this a
    rows-only-class operator pinned by the pure-python pytest reference.

    One Arrow ``mapInPandas`` pass (the chunker's plan shape): per-batch
    Python cost is one C-speed zlib call per doc, no shuffle, no window.
    Empty text pins raw_len=0, z_len=0, ratio NULL.
    """
    import zlib

    import pandas as pd

    lvl = int(level)
    schema = "id long, raw_len long, z_len long, ratio_permille long"

    def _batches(it):
        for pdf in it:
            texts = pdf[text_col].fillna("")
            raw = texts.map(lambda t: len(t.encode("utf-8")))
            zl = texts.map(
                lambda t: len(zlib.compress(t.encode("utf-8"), lvl))
                if t else 0
            )
            out = pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "raw_len": raw.astype("int64"),
                    "z_len": zl.astype("int64"),
                }
            )
            out["ratio_permille"] = (
                (out["z_len"] * 1000) // out["raw_len"].where(
                    out["raw_len"] > 0
                )
            ).astype("Int64")
            yield out

    return (
        df.select(F.col(id_col), F.col(text_col))
        .mapInPandas(_batches, schema)
        .withColumnRenamed("id", id_col)
    )
