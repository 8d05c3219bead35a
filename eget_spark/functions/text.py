"""Text operators: markdown/text cleaning (X6/X11/X16) and the
training-data analysis suite (language-ID, quality scoring, token counting,
fingerprinting).

Cleaning parity notes:
- `clean_markdown` reproduces the reference chunker's cleaning
  (/root/reference/services/chunker/chunk_service.py:27-63) **including its
  quirk**: the first pass replaces ALL whitespace (`\\s+` -> ' '), which
  destroys newlines before the newline-dependent fixes run (SURVEY.md X11).
  Expressed as a native regexp_replace chain — order-preserving, zero
  Python.
- `clean_text` reproduces the converters' cleanup
  (/root/reference/services/converters/base_converter.py:35-53): strip
  Unicode control chars (category C*), collapse non-newline whitespace,
  cap consecutive newlines at 2, strip each line.

Analysis operators are pure column expressions (JVM-side, codegen'd) except
where noted; each has an exact ANSI-SQL oracle in `__spark_entry__.py`.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Cleaning
# ---------------------------------------------------------------------------


def clean_markdown(md: Column) -> Column:
    """X11 (chunk_service.py:27-63), exact pass order:
    1. \\s+ -> ' '   (destroys newlines — reference quirk, kept)
    2. (#{1,6})([^#\\s]) -> '\\1 \\2'
    3. \\n{3,} -> '\\n\\n'   (no-op after 1, kept for parity)
    4. (\\n\\s*)-([^\\s]) -> '\\1- \\2'   (no-op after 1)
    5. strip HTML comments
    6. &nbsp; and \\xa0 -> ' '
    7. rstrip each line
    """
    # Python's \s (used by the reference) includes \xa0 and other Unicode
    # whitespace; Java's does not — widen the class for dialect parity
    c = F.regexp_replace(md, "[\\s\\u0085\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]+", " ")
    c = F.regexp_replace(c, r"(#{1,6})([^#\s])", r"$1 $2")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    c = F.regexp_replace(c, r"(\n\s*)-([^\s])", r"$1- $2")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", "")
    c = F.regexp_replace(c, r"&nbsp;", " ")
    c = F.regexp_replace(c, "\xa0", " ")
    c = F.regexp_replace(c, r"[ \t]+(\n|$)", r"$1")
    return c


@F.pandas_udf(T.StringType())
def _control_to_space_udf(s: pd.Series) -> pd.Series:
    def one(x):
        if x is None:
            return None
        return "".join(
            ch
            if ch in "\n\t" or not unicodedata.category(ch).startswith("C")
            else " "
            for ch in x
        )

    return s.map(one)


def clean_text(text: Column) -> Column:
    """X16, exact reference passes (base_converter.py:35-53):
    1. control chars (category C*) except \\n\\t -> ' ' (pandas UDF — the
       unicodedata pass)
    2. collapse non-newline whitespace ((?U) = Python-\\s parity)
    3. cap consecutive newlines at 2
    4. strip each line, then strip the whole text
    """
    c = _control_to_space_udf(text)
    c = F.regexp_replace(c, r"(?U)[^\S\n]+", " ")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    c = F.regexp_replace(c, r"(?Um)^[^\S\n]+|[^\S\n]+$", "")
    c = F.regexp_replace(c, r"(?U)^\s+|\s+$", "")
    return c


# ---------------------------------------------------------------------------
# Training-data text analysis (all native column expressions)
# ---------------------------------------------------------------------------

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language ID. Public common-word lists; deterministic and SQL-expressible.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
    "zh": ["de5", "shi4", "zhe4", "na4", "ge4"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (A4 analogue: semantic_chunker.py:160
    `content.split()`)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: count alpha runs, single digits, and single
    non-space punctuation — the common pre-tokenizer regex family."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def lang_score(text: Column, lang: str) -> Column:
    """Marker-word hit count for one language (stopword-ratio heuristic).
    One isin-filter per language keeps the expression tree (and codegen)
    small; equals the sum of per-marker counts since markers are disjoint."""
    toks = tokens(F.lower(text))
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(text: Column) -> Column:
    """Predicted language = argmax marker-hit count, ties -> alphabetically
    first language; 'und' when no marker hits at all.

    NOTE: this single-expression form compiles a large codegen unit (~30 s
    one-time janino cost); prefer `lang_id_df` in pipelines."""
    scores = [(lang, lang_score(text, lang)) for lang in sorted(LANG_MARKERS)]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # first language (in sorted order) achieving the max wins
    for lang, s in reversed(scores):
        pred = F.when(s == best, F.lit(lang)).otherwise(pred)
    return F.when(best == 0, F.lit("und")).otherwise(pred)


def lang_id_df(df, id_col: str, text_col: str):
    """Relational language ID: explode tokens, broadcast-join the marker
    table, argmax per doc (count desc, lang asc). Same semantics as
    `lang_id`, but pure codegen'd joins/aggs — no expression blowup, scales
    with shuffle parallelism. Returns (id_col, pred_lang)."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    markers = spark.createDataFrame(
        [(lang, m) for lang, ms in LANG_MARKERS.items() for m in ms],
        "lang string, marker string",
    )
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("t")
    )
    hits = (
        toks.join(F.broadcast(markers), F.col("t") == F.col("marker"))
        .groupBy(id_col, "lang")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("n").desc(), F.col("lang"))
    best = (
        hits.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"))
    )
    return df.select(id_col).join(best, id_col, "left").select(
        id_col, F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang")
    )


def quality_score(text: Column) -> Column:
    """Quality heuristic in [0,1]: blends length, alpha ratio, punctuation
    density, mean word length sanity, and repetition (unique-token ratio).
    Pure arithmetic — identical formula in the SQL oracle."""
    n_chars = F.length(text)
    toks = tokens(text)
    n_toks = token_count(text)
    n_alpha = n_chars - F.length(F.regexp_replace(text, r"[A-Za-z]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    mean_word_len = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    uniq_ratio = F.when(
        n_toks > 0, F.size(F.array_distinct(toks)) / n_toks
    ).otherwise(F.lit(0.0))
    len_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alpha_term = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_term = F.when(
        n_chars > 0, F.least(n_punct / n_chars * 20.0, F.lit(1.0))
    ).otherwise(F.lit(0.0))
    word_len_term = F.when(
        (mean_word_len >= 3.0) & (mean_word_len <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round(
        0.3 * len_term + 0.25 * alpha_term + 0.15 * punct_term
        + 0.15 * word_len_term + 0.15 * uniq_ratio,
        6,
    )


# small high-frequency English function-word list — the standard
# quality-filter signal (low stopword ratio => boilerplate/code/gibberish)
_STOPWORDS = [
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on", "at",
    "for", "with", "by", "from", "as", "is", "are", "was", "were", "be",
    "been", "it", "its", "this", "that", "these", "those", "he", "she",
    "they", "we", "you", "i", "not", "no", "do", "does", "did", "have",
    "has", "had", "will", "would", "can", "could", "their", "his", "her",
]


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are English stopwords — the quality-scoring
    companion signal (task brief: length/punct/stopword ratios). Counts
    occurrences (not distinct hits), pure column expressions."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    return F.when(n > 0, F.round(stop / n, 6)).otherwise(F.lit(0.0))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles (array<string>), the dedup/fingerprint unit."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def shingle_rows(df, id_col: str, text_col: str, k: int = 3, cluster: bool = True):
    """Word k-gram shingles as ROWS (id, s) — the fast path.

    The array-returning `shingles()` column fn runs in Spark's interpreted
    higher-order-function evaluator (~4x slower measured at sf0.1); this
    variant stays in whole-stage codegen: explode a start-index sequence
    and slice the token array by position (``F.get`` — 0-based, NULL out
    of bounds, so the short-doc case n < k falls out of the same
    expression: one start index, trailing NULLs dropped by ``concat_ws``).
    The round-5 window/lead form shuffled every TOKEN row and sorted per
    doc before any consumer aggregation; this form shuffles only the doc
    rows (``cluster=True``, default): one narrow hash exchange on id that
    (a) spreads shingle generation + downstream hashing across the
    cluster even when the source scan has few effective splits (a single
    small parquet row group scans as 1-2 tasks), and (b) leaves the
    output CLUSTERED BY id with no union in the plan, so consumer
    ``distinct()`` / ``groupBy("id")`` / id-keyed pair aggregates plan
    with NO further exchange (guide §2.3/§2.4).  ``cluster=False`` skips
    the exchange for callers that only feed map-side partial aggregation
    and already scan with enough parallelism.  Duplicate shingles are
    kept (min-aggregations are unaffected); `.distinct()` for set
    semantics."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
    if cluster:
        # explicit partition count (REPARTITION_BY_NUM): with the
        # column-only form AQE coalesces this exchange by BYTE size, and
        # the downstream stage (shingle explode + per-shingle hashing —
        # compute-heavy, byte-light) ran on half the cluster (measured 16
        # of 32 slots at sf1.0, the minhash stage's whole critical path).
        # The count comes from the session's shuffle-partition setting,
        # so it scales with the cluster, not a local constant.
        # The exchange moves the RAW text, not the token array: the scan
        # side often has 1-2 effective splits, so tokenization belongs
        # AFTER the exchange where it runs at full width (and the text
        # bytes are smaller than the exploded token-array rows anyway).
        n_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        base = base.repartition(n_parts, F.col("id"))
    base = base.select("id", tokens(F.lower(F.col("_txt"))).alias("_toks"))
    return base.select(
        "id",
        "_toks",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.size("_toks") - k, F.lit(0)))
        ).alias("_i"),
    ).select(
        "id",
        F.concat_ws(
            " ", *[F.get("_toks", F.col("_i") + j) for j in range(k)]
        ).alias("s"),
    )


def fingerprint(text: Column, k: int = 3) -> Column:
    """Document fingerprint: min md5 over k-shingles (min-wise independent
    permutation of one hash — the winnowing-lite/minhash-1 fingerprint)."""
    return F.array_min(F.transform(shingles(text, k), lambda s: F.md5(s)))


def read_time_minutes(text: Column) -> Column:
    """X13 estimated_read_time = max(1, words // 200)
    (semantic_chunker.py:214)."""
    return F.greatest(F.lit(1), F.floor(token_count(text) / 200)).cast("int")


def char_entropy_df(df, id_col: str, text_col: str):
    """Shannon character entropy per document (bits/char) — the gibberish/
    binary-noise quality signal (low entropy = repetition, high = noise).

    Relational form (scales, stays in codegen): explode characters, count
    per (id, char), entropy = -sum((c/L)*log2(c/L)) per id. Two uniform
    shuffles keyed by doc id; no Python. Returns (id_col, char_entropy)
    with 0.0 for empty/null text, rounded to 6 (matches the SQL oracle)."""
    from pyspark.sql.window import Window

    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).where(F.length("ch") > 0)
    counts = chars.groupBy(id_col, "ch").agg(F.count("*").alias("c"))
    p = F.col("c") / F.col("_L")
    ent = (
        counts.withColumn("_L", F.sum("c").over(Window.partitionBy(id_col)))
        .groupBy(id_col)
        # + 0.0 canonicalizes IEEE -0.0 (single-char docs) to +0.0
        .agg(F.round(-F.sum(p * F.log2(p)) + F.lit(0.0), 6).alias("char_entropy"))
    )
    return df.select(id_col).join(ent, id_col, "left").select(
        id_col, F.coalesce(F.col("char_entropy"), F.lit(0.0)).alias("char_entropy")
    )


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Top-k TF-IDF terms per document — the classic corpus-statistics
    operator for training-data analysis (keyword extraction, topic drift).

    tf = term count in doc, idf = ln(N / df) with df = #docs containing the
    term; rank by (tfidf desc, term asc). All relational: token explode ->
    (id, term) counts -> term document-frequency agg -> join -> window
    top-k (WindowGroupLimit pushes the rank filter map-side). Returns
    (id_col, term, tfidf, rnk)."""
    from pyspark.sql.window import Window

    n_docs = df.count()
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("_tfidf"),
    )
    # rank on the ROUNDED score: tied scores from distinct (tf, df) pairs
    # (e.g. 2*ln(2) vs ln(4)) can differ by an ulp between JVM and DuckDB
    # libm, which would flip row_number order cross-engine; rounding first
    # resolves such ties identically via the term tiebreak (round-2 advice)
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("_tfidf"), 6).desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            id_col,
            "term",
            F.round(F.col("_tfidf"), 6).alias("tfidf"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# Latin-1 Supplement + Latin Extended-A accent folding, pinned as an
# explicit translate map (both engines run the IDENTICAL table, so the
# fold is engine-portable by construction — no locale/ICU dependence).
# Source/target stay 1:1 per char (translate's contract); multi-char
# expansions (ae, ss, oe...) are handled by replace() below.
ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöøùúûüýÿāăąćĉċčďđēĕėęěĝğġģĥħĩīĭįıĵķĸĺļľłńņňŋōŏőŕŗřśŝşšţťŧũūŭůűųŵŷźżž"
ACCENT_DST = "aaaaaaceeeeiiiinoooooouuuuyyaaaccccddeeeeegggghhiiiiijkkllllnnnnooorrrsssstttuuuuuuwyzzz"


def fold_accents(text: Column) -> Column:
    """Lower-case + accent fold via the pinned translate table, with the
    three multi-char Latin-1 expansions (æ->ae, œ->oe, ß->ss) applied
    first.  Zero-shuffle column algebra."""
    t = F.lower(text)
    t = F.replace(t, F.lit("æ"), F.lit("ae"))
    t = F.replace(t, F.lit("œ"), F.lit("oe"))
    t = F.replace(t, F.lit("ß"), F.lit("ss"))
    return F.translate(t, ACCENT_SRC, ACCENT_DST)


def dedup_normalize(text: Column) -> Column:
    """The CCNet-style normalization applied before dedup hashing (Wenzek
    et al. 2020 normalize: lowercase, strip accents, drop punctuation,
    collapse whitespace) — near-dup variants that differ only in case,
    diacritics, punctuation, or spacing hash identically afterwards.
    Pinned pipeline: fold_accents -> non-[a-z0-9] runs to ONE space ->
    trim.  Pure projection; pair with md5() for the dedup key."""
    return F.trim(
        F.regexp_replace(fold_accents(text), r"[^a-z0-9]+", " ")
    )


def oov_stats(df, id_col: str, text_col: str, vocab_size: int = 100):
    """Out-of-vocabulary rate per document against the corpus' own top
    ``vocab_size`` tokens by document frequency (ties: token asc) — the
    tokenizer-coverage signal a training pipeline tracks per source
    (high OOV -> encoding explosion under any fixed vocab).

    Scale shape: vocabulary = one explode-distinct + map-side-combined
    df count + top-k (TakeOrdered, sketch-sized); scoring embeds the
    vocab as an isin LITERAL — a zero-join, zero-shuffle projection,
    the same literal-small-side discipline as bm25_topk and the PQ
    codebooks.  Returns (id, n_tokens, oov_ratio) with oov_ratio = 0.0
    for empty docs (pinned).

    Tokenization is the BM25/LM discipline ([^a-z0-9]+ split, empties
    dropped — operators/lm_score.TOKEN_SPLIT), NOT bare whitespace:
    vocab membership must not depend on attached punctuation.
    """
    from ..operators.lm_score import TOKEN_SPLIT

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
        lambda t: t != F.lit(""),
    )
    pairs = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("t"))
        .distinct()
    )
    vocab_rows = (
        pairs.groupBy("t")
        .agg(F.count("*").alias("_df"))
        .orderBy(F.col("_df").desc(), F.col("t"))
        .limit(vocab_size)
        .collect()
    )
    vocab = [r["t"] for r in vocab_rows]
    n = F.size(toks)
    inv = F.size(F.filter(toks, lambda t: t.isin(*vocab)))
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_tokens"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(F.round(F.lit(1.0) - inv / n, 6))
        .alias("oov_ratio"),
    )


def vocab_growth(df, id_col: str, text_col: str, thresholds: list[int]):
    """Vocabulary-growth (Heaps-law) profile: distinct-token count among
    documents with ``id <= t`` for each threshold ``t`` — the corpus
    curve that sizes tokenizers and predicts OOV decay as a crawl grows.

    Exact semantics (pinned): tokens are the engine-wide TOKEN_SPLIT
    contract; a token's first appearance is ``min(id)`` over documents
    containing it; vocab(t) counts tokens with first_id <= t.  Returns
    (threshold, vocab_size) sorted by threshold — EVERY requested
    threshold appears (vocab_size 0 when no token qualifies), except on
    a fully tokenless corpus, which yields no rows.

    Scale shape: ONE map-side-combined groupBy(token) min-aggregate over
    the exploded corpus (cardinality: distinct tokens); each token row
    then explodes onto the tiny threshold list (|thresholds| rows) and a
    second map-side-combined groupBy(threshold) counts — no window over
    the corpus, no join, no driver data."""
    from pyspark.sql import functions as F

    from ..operators.lm_score import TOKEN_SPLIT

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    first = toks.groupBy("tok").agg(F.min("id").alias("first_id"))
    th = F.array(*[F.lit(int(t)).cast("long") for t in sorted(thresholds)])
    return (
        first.select("first_id", F.explode(th).alias("threshold"))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("first_id") <= F.col("threshold"), 1).otherwise(0)
            )
            .cast("long")
            .alias("vocab_size")
        )
        .orderBy("threshold")
    )


def heaps_fit(df, id_col: str, text_col: str, thresholds: list[int]):
    """Heaps-law least-squares fit V = K * T^beta over the vocabulary
    growth curve — the parameters that size a tokenizer vocabulary and
    predict OOV decay before committing to a full-corpus pass (the
    regression companion to :func:`vocab_growth`'s raw curve).

    Exact semantics (pinned so the SQL oracle is bit-identical): at each
    id-threshold checkpoint t, T(t) = total TOKEN_SPLIT tokens over docs
    with id <= t and V(t) = distinct tokens whose first-appearance doc
    id <= t; checkpoints with T=0 or V=0 drop out; x = ln(T), y = ln(V)
    quantized to int64 micro-units (round(ln*1e6)); beta and lnK come
    from ordinary least squares computed on EXACT int64 sums (n*Sxy -
    Sx*Sy over n*Sxx - Sx^2, so engine summation order cannot perturb
    the result), each final ratio rounded to 6 decimals.  Thresholds
    beyond the corpus saturate to (T_total, V_total) and deliberately
    stay in the fit (tail-weighted, pinned).  Requires >= 2 distinct
    checkpoint token counts or the slope denominator is zero.

    Returns one row per surviving checkpoint: (threshold, cum_tokens,
    vocab_size, heaps_beta, heaps_lnk) with the fit constants repeated.

    Scale shape: two map-side-combined aggregates over the exploded
    corpus (per-token min-id, per-doc token count), each exploded onto
    the tiny threshold list and re-aggregated per threshold; the
    regression runs on |thresholds| rows joined back as a broadcast —
    no window over the corpus, no driver-side math."""
    from pyspark.sql import functions as F

    from ..operators.lm_score import TOKEN_SPLIT

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    th = F.array(*[F.lit(int(t)).cast("long") for t in sorted(thresholds)])
    first = toks.groupBy("tok").agg(F.min("id").alias("first_id"))
    vocab = (
        first.select("first_id", F.explode(th).alias("threshold"))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("first_id") <= F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("vocab_size")
        )
    )
    dtc = toks.groupBy("id").agg(F.count("*").alias("c"))
    cumtok = (
        dtc.select("id", "c", F.explode(th).alias("threshold"))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("id") <= F.col("threshold"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("cum_tokens")
        )
    )
    pts = (
        vocab.join(cumtok, "threshold")
        .where((F.col("vocab_size") > 0) & (F.col("cum_tokens") > 0))
    )
    fx = pts.select(
        "threshold",
        "cum_tokens",
        "vocab_size",
        F.round(F.log(F.col("cum_tokens").cast("double")) * 1e6, 0)
        .cast("long")
        .alias("xi"),
        F.round(F.log(F.col("vocab_size").cast("double")) * 1e6, 0)
        .cast("long")
        .alias("yi"),
    )
    fit = fx.agg(
        F.count("*").alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("yi").alias("sy"),
        F.sum(F.col("xi") * F.col("yi")).alias("sxy"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
    ).select(
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
            6,
        ).alias("heaps_beta"),
        F.col("n"),
        F.col("sx"),
        F.col("sy"),
    )
    fit = fit.select(
        "heaps_beta",
        F.round(
            (
                F.col("sy").cast("double") / F.lit(1e6)
                - F.col("heaps_beta") * (F.col("sx").cast("double") / F.lit(1e6))
            )
            / F.col("n").cast("double"),
            6,
        ).alias("heaps_lnk"),
    )
    return pts.select("threshold", "cum_tokens", "vocab_size").crossJoin(
        F.broadcast(fit)
    )


def zipf_fit(df, id_col: str, text_col: str, top_n: int = 1000):
    """Zipf rank-frequency fit freq = C * rank^(-s) over the corpus term
    distribution — the companion diagnostic to :func:`heaps_fit` (a
    natural-language corpus shows s ~= 1; machine-generated spam and
    template farms bend the curve, so the fitted slope is a corpus-level
    quality signal).

    Exact semantics (pinned): tokens are the engine-wide TOKEN_SPLIT
    contract; freq = corpus-wide token count; rank = position under
    (freq DESC, token ASC) — a total order, so ranks are unambiguous;
    the fit uses ranks 1..min(V, top_n); x = ln(rank), y = ln(freq)
    quantized to int64 micro-units (round(ln*1e6)); slope and intercept
    from OLS on EXACT int64 sums, each final ratio rounded to 6;
    ``zipf_s`` is the NEGATED slope (so Zipfian corpora report ~+1).
    Requires >= 2 fitted ranks.

    Returns one row per fitted rank: (rank, tok, freq, zipf_s, zipf_lnc).

    Scale shape: one map-side-combined groupBy(token) count; the global
    rank comes from the range-exchange sequencer (never a single-
    partition window); the top-n filter is a rank predicate; the 2-value
    fit joins back as a broadcast."""
    from pyspark.sql import functions as F

    from ..operators.lm_score import TOKEN_SPLIT
    from ..operators.sequence import with_global_seq

    toks = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("freq"))
    ranked = with_global_seq(
        freq.withColumn("_nf", -F.col("freq")), ["_nf", "tok"], start=1,
        seq_col="rank",
    ).df
    pts = ranked.where(F.col("rank") <= top_n).select("rank", "tok", "freq")
    fx = pts.select(
        F.round(F.log(F.col("rank").cast("double")) * 1e6, 0)
        .cast("long")
        .alias("xi"),
        F.round(F.log(F.col("freq").cast("double")) * 1e6, 0)
        .cast("long")
        .alias("yi"),
    )
    fit = fx.agg(
        F.count("*").alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("yi").alias("sy"),
        F.sum(F.col("xi") * F.col("yi")).alias("sxy"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
    ).select(
        F.round(
            -(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
            ),
            6,
        ).alias("zipf_s"),
        F.col("n"),
        F.col("sx"),
        F.col("sy"),
    )
    fit = fit.select(
        "zipf_s",
        F.round(
            (
                F.col("sy").cast("double") / F.lit(1e6)
                + F.col("zipf_s") * (F.col("sx").cast("double") / F.lit(1e6))
            )
            / F.col("n").cast("double"),
            6,
        ).alias("zipf_lnc"),
    )
    return pts.crossJoin(F.broadcast(fit))


def flesch_reading_ease(df, id_col: str, text_col: str):
    """Flesch reading-ease readability score — the classic curation
    signal for audience-level filtering of a web corpus (reference
    scores quality by length/ratio heuristics only; this adds the
    standard readability axis).

    Exact semantics (pinned so the SQL oracle is bit-identical):
    sentences = max(1, count of ``[.!?]+`` runs in the raw text); words
    = engine-wide TOKEN_SPLIT tokens of lower(text); syllables(word) =
    max(1, count of ``[aeiouy]+`` vowel groups); flesch = round(206.835
    - 1.015*(words/sentences) - 84.6*(syllables/words), 6), NULL for
    zero-word docs.  All divisions are exactly-rounded IEEE doubles of
    int64 counts, so both engines compute the same bits.

    Scale shape: a ZERO-SHUFFLE scan-side projection — the per-word
    syllable sum is an ``aggregate`` higher-order fold over the token
    array, so there is no explode, no groupBy, no Exchange anywhere;
    the score pipelines with any downstream filter at 100 TB."""
    n_sent, n_words, n_syll, flesch = _flesch_parts(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
        flesch.alias("flesch"),
    )


def flesch_score(text: Column) -> Column:
    """The ``flesch_reading_ease`` score as a pure column expression —
    NULL for zero-word docs; same pinned semantics."""
    return _flesch_parts(text)[3]


def _flesch_parts(text: Column):
    from ..operators.lm_score import TOKEN_SPLIT

    toks = F.filter(F.split(F.lower(text), TOKEN_SPLIT), lambda t: t != F.lit(""))
    n_words = F.size(toks).cast("long")
    n_syll = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.lit(1).cast("long"), F.regexp_count(w, F.lit("[aeiouy]+"))),
    )
    n_sent = F.greatest(
        F.lit(1).cast("long"),
        F.regexp_count(text, F.lit(r"[.!?]+")).cast("long"),
    )
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sent)
        - F.lit(84.6) * (n_syll / n_words),
        6,
    )
    return n_sent, n_words, n_syll, F.when(n_words > 0, flesch)


def word_vocab(df, text_col: str):
    """(word, cnt) — the corpus compacted to its word VOCABULARY under
    the engine-wide TOKEN_SPLIT contract (one map-side-combined groupBy;
    the shared compaction of bpe_pair_counts and operators/bpe.py, so
    the q125 pair stats and BPE training can never drift)."""
    from ..operators.lm_score import TOKEN_SPLIT

    words = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def bpe_pair_counts(df, id_col: str, text_col: str, top_k: int = 50):
    """Top adjacent character-pair frequencies over the corpus — the
    first merge-selection step of BPE tokenizer training (Sennrich et
    al. 2016), run as corpus analytics to pick merges / audit tokenizer
    fit against a crawl.

    Exact semantics (pinned): word = TOKEN_SPLIT token of lower(text);
    each word of length L contributes its L-1 adjacent char pairs
    weighted by the word's corpus OCCURRENCE count; output = top_k
    pairs by (n desc, pair asc) — the deterministic tie order makes the
    cut engine-exact.

    Scale shape (the tokenizer-training trick): ONE map-side-combined
    groupBy(word) compacts the corpus to its VOCABULARY first, so the
    char-pair explode runs over |vocab| rows, not |corpus| tokens —
    at 100 TB the vocab is millions of rows while token occurrences are
    trillions.  Pair extraction is a zero-shuffle transform/substr HOF;
    the final aggregate map-side-combines on the tiny pair space."""
    vocab = word_vocab(df, text_col)
    pairs = vocab.where(F.length("word") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substr(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(top_k)
    )


# (script, Java-regex class, RE2/DuckDB-regex class) — fixed order: the
# dominant-script tie rule is FIRST IN THIS LIST among equals
SCRIPT_CLASSES = [
    ("latin", r"[\p{IsLatin}]", r"[\p{Latin}]"),
    ("cyrillic", r"[\p{IsCyrillic}]", r"[\p{Cyrillic}]"),
    ("greek", r"[\p{IsGreek}]", r"[\p{Greek}]"),
    ("arabic", r"[\p{IsArabic}]", r"[\p{Arabic}]"),
    ("hebrew", r"[\p{IsHebrew}]", r"[\p{Hebrew}]"),
    ("devanagari", r"[\p{IsDevanagari}]", r"[\p{Devanagari}]"),
    ("han", r"[\p{IsHan}]", r"[\p{Han}]"),
    ("hangul", r"[\p{IsHangul}]", r"[\p{Hangul}]"),
]

# UTF-8-read-as-Latin-1 mojibake signature: 0xC3 ("\u00c3") followed by a
# Latin-1-supplement continuation char covers the whole accented-Latin
# block ("Ã©" = e-acute, "Ã¤" = a-umlaut, ...)
MOJIBAKE_RE = "\u00c3[\u0080-\u00ff]"


def script_profile(df, id_col: str, text_col: str):
    r"""Per-document Unicode-script census + mojibake flag — the
    multilingual-curation signal next to :func:`lang_id`: lang-id says
    WHICH language, the script profile says whether the doc is
    script-consistent at all (code-switching, spam keyword stuffing in a
    second script, and encoding damage all show up as mixed or unexpected
    scripts long before a language model sees the text).

    Training-data-pipeline extension (not a reference operator); the
    mojibake signature (UTF-8 bytes decoded as Latin-1: 0xC3 + supplement
    char, the "Ã©" artifact) is the classic Common-Crawl encoding-damage
    probe.

    Pinned semantics (engine-portable, oracle-checked):
    - per script s in SCRIPT_CLASSES: n_s = count of chars matching the
      script class (Java ``\p{IsX}`` == RE2 ``\p{X}``), computed as
      length(text) - length(regexp_replace(text, class, ''));
    - dominant = the first script in SCRIPT_CLASSES order holding the
      maximum count, or 'none' when every count is 0;
    - dominant_permille = 1000 * max_count div length(text) (0 for empty
      text); mojibake_hits = matches of MOJIBAKE_RE (chars div 2).

    Scale shape: pure zero-shuffle projection — a fixed set of
    regexp_replace length diffs inside whole-stage codegen; no explode,
    no Python, no aggregation.
    """
    t = F.col(text_col)
    out = df.select(F.col(id_col), t.alias("_t"))
    for name, java_re, _ in SCRIPT_CLASSES:
        out = out.withColumn(
            f"n_{name}",
            (F.length("_t") - F.length(F.regexp_replace("_t", java_re, "")))
            .cast("long"),
        )
    counts = [F.col(f"n_{n}") for n, _, _ in SCRIPT_CLASSES]
    mx = F.greatest(*counts)
    dom = F.lit("none")
    for name, _, _ in reversed(SCRIPT_CLASSES):
        dom = F.when(
            (mx > 0) & (F.col(f"n_{name}") == mx), F.lit(name)
        ).otherwise(dom)
    return (
        out.withColumn("dominant", dom)
        .withColumn(
            "dominant_permille",
            F.when(
                F.length("_t") > 0,
                F.expr(
                    "(1000 * greatest("
                    + ", ".join("n_" + n for n, _, _ in SCRIPT_CLASSES)
                    + ")) div length(_t)"
                ),
            ).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn(
            "mojibake_hits",
            (
                (F.length("_t")
                 - F.length(F.regexp_replace("_t", MOJIBAKE_RE, "")))
                / 2
            ).cast("long"),
        )
        .drop("_t")
    )


def readability_indices(df, id_col: str, text_col: str):
    """The classic readability-index family beyond q124's Flesch:
    Gunning Fog (Gunning 1952), SMOG (McLaughlin, Journal of Reading
    1969), and Coleman-Liau (Coleman & Liau, JAP 1975) — together the
    standard audience-level axes for corpus curation (Fog/SMOG lean on
    polysyllables, Coleman-Liau is purely character-based, so the three
    disagree exactly where harvesting noise hides).

    Pinned semantics (bit-exact across engines): sentences/words/
    syllable groups follow the q124 contract (``[.!?]+`` runs floored
    at 1; engine-wide TOKEN_SPLIT tokens; ``[aeiouy]+`` vowel groups);
    complex words have >= 3 vowel groups; letters = total token chars
    (alnum by construction).  Each index is one scalar chain over int64
    counts with single double divisions, round-6:

    - fog  = 0.4 * (words/sentences + (complex*100)/words)
    - smog = 1.043 * sqrt((complex*30)/sentences) + 3.1291
    - cli  = 0.0588*(letters*100/words) - 0.296*(sentences*100/words)
             - 15.8

    All three are NULL for zero-word docs.

    Scale shape: ZERO-shuffle scan-side projection — both per-word sums
    are ``aggregate`` higher-order folds over the token array (no
    explode, no groupBy, no Exchange anywhere), same as q124."""
    from ..operators.lm_score import TOKEN_SPLIT

    text = F.col(text_col)
    toks = F.filter(
        F.split(F.lower(text), TOKEN_SPLIT), lambda t: t != F.lit("")
    )
    n_words = F.size(toks).cast("long")
    n_complex = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + (F.regexp_count(w, F.lit("[aeiouy]+")) >= 3).cast("long"),
    )
    n_letters = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w).cast("long"),
    )
    n_sent = F.greatest(
        F.lit(1).cast("long"),
        F.regexp_count(text, F.lit(r"[.!?]+")).cast("long"),
    )
    fog = F.round(
        F.lit(0.4) * (n_words / n_sent + (n_complex * 100) / n_words), 6
    )
    smog = F.round(
        F.lit(1.043) * F.sqrt((n_complex * 30) / n_sent) + F.lit(3.1291), 6
    )
    cli = F.round(
        F.lit(0.0588) * ((n_letters * 100) / n_words)
        - F.lit(0.296) * ((n_sent * 100) / n_words)
        - F.lit(15.8),
        6,
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_complex.alias("n_complex"),
        n_letters.alias("n_letters"),
        F.when(n_words > 0, fog).alias("fog"),
        F.when(n_words > 0, smog).alias("smog"),
        F.when(n_words > 0, cli).alias("cli"),
    )
