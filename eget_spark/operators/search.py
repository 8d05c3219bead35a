"""BM25 keyword search over the document corpus.

The classic retrieval scorer (Robertson & Sparck Jones probabilistic
relevance framework; the BM25 form is public in Robertson et al., TREC-3):
for a query Q = {t_1..t_q},

    score(D, Q) = sum_i idf(t_i) * tf_i * (k1 + 1)
                          / (tf_i + k1 * (1 - b + b * |D| / avgdl))
    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))

In a crawl/curation pipeline this is the "find the docs about X" primitive
(contamination probes, topic audits, corpus QA) — the reference exposes
search-shaped scraping (`/root/reference/api/v1/endpoints/scrape.py`) but no
ranking; BM25 is the standard public ranking function for the job.

Scale shape (100 TB): the query term list is tiny and rides INSIDE the
expression tree — per-document tf_i is an array `filter` over the token
array (no explode, no per-term shuffle).  Corpus statistics (N, sum |D|,
df per term) reduce to ONE single-row aggregate (map-side combined), which
re-enters via a 1-row broadcast cross join.  Scoring is then a pure
projection, and top-k is `orderBy().limit(k)` — Spark plans
TakeOrderedAndProject (per-partition heap + driver merge of k rows), never
a global sort shuffle.  Zero wide shuffles end-to-end.

Determinism: every arithmetic op except `ln` is IEEE exactly-rounded and
therefore engine-identical; scores are rounded to 6 decimals before
ranking and ties break on doc id, the repo-wide recipe for cross-engine
(JVM vs DuckDB libm) ulp tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .lm_score import TOKEN_SPLIT


def _tok_arr(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != F.lit("")
    )


def posting_list_layout(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Inverted-index posting-list layout report: per term, the doc-id
    posting list's delta-gap + varint storage cost — the standard
    index-compression layout (Witten/Moffat/Bell "Managing Gigabytes"
    d-gaps; the VByte coding of Williams & Zobel 1999) that every web
    search index (Lucene's .doc postings among them) builds on.  The
    index-sizing companion to the ZipNum layout report for CDX keys
    (sources/warc.zipnum_blocks): rare terms store near-raw ids, frequent
    terms compress to ~1 byte/posting, and the report quantifies it
    before committing a 100-TB corpus to an index build.

    Pinned semantics: terms are the engine-wide TOKEN_SPLIT contract;
    the posting list is the DISTINCT doc ids containing the term,
    ascending; gaps are ``id - lag(id)`` with the FIRST entry storing
    ``id + 1`` (ids are 0-based; varint cannot store 0-length... the
    +1 keeps every stored value >= 1, pinned); varint bytes per value v
    = 1 + floor(log128(v)) computed by integer thresholds (v < 128 -> 1,
    < 16384 -> 2, < 2^21 -> 3, < 2^28 -> 4, else 5 — doc ids fit 5).
    Returns one row per term: (tok, df_count, raw_bytes, varint_bytes,
    savings) with raw_bytes = 8 * df_count (int64 ids) and savings
    rounded to 6.

    Scale shape: one map-side-combined distinct on (term, doc), ONE
    window partitioned by term (partitions = posting lists — millions of
    them, never single-partition) ordered by doc id for the lag, one
    map-side-combined sum per term.  No Python, no driver rows."""
    from pyspark.sql.window import Window

    postings = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(_tok_arr(text_col)).alias("tok"),
        )
        .distinct()
    )
    w = Window.partitionBy("tok").orderBy("doc")
    gap = F.coalesce(
        F.col("doc") - F.lag("doc").over(w), F.col("doc") + 1
    ).cast("long")
    vb = (
        F.when(gap < 128, 1)
        .when(gap < 16384, 2)
        .when(gap < (1 << 21), 3)
        .when(gap < (1 << 28), 4)
        .otherwise(5)
        .cast("long")
    )
    per = postings.select("tok", gap.alias("_gap"), vb.alias("_vb"))
    return (
        per.groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("df_count"),
            (F.count("*") * 8).cast("long").alias("raw_bytes"),
            F.sum("_vb").cast("long").alias("varint_bytes"),
        )
        .select(
            "tok",
            "df_count",
            "raw_bytes",
            "varint_bytes",
            F.round(
                1.0 - F.col("varint_bytes") / F.col("raw_bytes"), 6
            ).alias("savings"),
        )
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    Returns (id_col, score, rnk) — score rounded to 6, rank dense from 1,
    ties broken by id. Documents matching no query term are excluded.
    """
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    arr = _tok_arr(text_col).alias("_l")

    # single-arg closure factory: a `lambda x, t=t:` default arg would make
    # F.filter bind its optional (element, index) TWO-arg form
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    base = df.select(F.col(id_col), arr).select(
        id_col,
        F.size("_l").cast("long").alias("_dl"),
        *[
            F.size(F.filter("_l", _eq(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    return _bm25_from_tf(base, id_col, terms, k=k, k1=k1, b=b)


def _bm25_from_tf(
    base: DataFrame,
    id_col: str,
    terms: list[str],
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """BM25 scoring tail shared by :func:`bm25_topk` and
    :func:`anchor_bm25_topk`: ``base`` is (id, _dl, _tf0.._tfn) however
    the caller derived term frequencies (document text, anchor pseudo-
    docs).  Corpus stats ride a 1-row broadcast; top-k is TakeOrdered."""
    stats = base.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_dl").cast("long").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    avgdl = F.col("_sumdl") / F.col("_n")
    parts = []
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            1.0 + (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        norm = tf + k1 * (1.0 - b + b * F.col("_dl") / avgdl)
        parts.append(F.when(tf > 0, idf * tf * (k1 + 1.0) / norm).otherwise(F.lit(0.0)))
    score = F.round(sum(parts[1:], parts[0]), 6)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .select(id_col, score.alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    # rnk over the k already-selected rows: the single-partition window is
    # trivial (k rows post-TakeOrdered), not a corpus-wide sort
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rnk", F.row_number().over(w).cast("int"))


def anchor_bm25_topk(
    pairs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    target_col: str = "target",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Anchor-text ranking: BM25 where each link TARGET's pseudo-document
    is the multiset of tokens from every in-link's anchor text (Craswell,
    Hawking & Robertson, SIGIR 2001: anchor text outperforms page content
    for site-finding/navigational queries — the classic crawl-corpus
    relevance signal a content-only index misses).  ``pairs`` is the
    (target, anchor) harvest of :func:`eget_spark.functions.spans.
    link_anchor_pairs`; the BM25 length norm uses the pseudo-document's
    token count, so heavily-linked targets are normalized exactly like
    long documents.

    Returns (target_col, score, rnk) — same contract as :func:`bm25_topk`
    (score rounded to 6, dense rank from 1, ties by target).

    Scale shape: the pseudo-documents are NEVER materialized as strings —
    tokens explode straight out of the anchor column and per-target
    (_dl, _tf*) roll up in ONE map-side-combined aggregation, so a
    homepage with 10^8 in-links costs a combiner cell, not a 10^8-token
    collect_list; scoring is the shared :func:`_bm25_from_tf` tail
    (1-row broadcast stats + TakeOrdered top-k)."""
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    toks = pairs.select(
        F.col(target_col),
        F.explode(_tok_arr(anchor_col)).alias("_tok"),
    )
    base = toks.groupBy(target_col).agg(
        F.count("*").cast("long").alias("_dl"),
        *[
            F.sum((F.col("_tok") == F.lit(t)).cast("long"))
            .cast("long")
            .alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    return _bm25_from_tf(base, target_col, terms, k=k, k1=k1, b=b)


def ql_dirichlet_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    mu: float = 2000.0,
    k: int = 20,
) -> DataFrame:
    """Query-likelihood ranking with Dirichlet-prior smoothing (Zhai &
    Lafferty, SIGIR 2001 — the language-modeling retrieval family next
    to BM25/BM25F/RRF):

        score(D, Q) = sum_t ln( (tf_t + mu * p(t|C)) / (|D| + mu) )
        p(t|C)      = ctf_t / total_collection_tokens

    Smoothing is the point: a document MISSING a query term still gets
    that term's collection-probability mass (discounted by its length),
    so multi-term queries rank partial matches sensibly where unsmoothed
    ML assigns zero.  Pinned contract: query terms with ctf == 0
    (never seen in the collection) contribute 0 — the standard drop,
    since their smoothed probability is 0 for every document and the
    constant -inf would poison all scores equally.  All documents score
    (scores are negative log-probabilities); top-k by (score DESC, id),
    rounded to 6 before ranking (the repo-wide cross-engine ulp recipe).

    Scale shape: identical to :func:`bm25_topk` — per-doc tf_i is an
    array ``filter`` (no explode, no per-term shuffle), collection stats
    (sum dl, ctf per term) are ONE map-side-combined 1-row aggregate
    re-entering via broadcast, scoring a pure projection, top-k
    TakeOrderedAndProject.  Zero wide shuffles.

    Returns (id_col, score, rnk).
    """
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    arr = _tok_arr(text_col).alias("_l")

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    base = df.select(F.col(id_col), arr).select(
        id_col,
        F.size("_l").cast("long").alias("_dl"),
        *[
            F.size(F.filter("_l", _eq(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.sum("_dl").cast("long").alias("_sumdl"),
        *[
            F.sum(F.col(f"_tf{i}")).cast("long").alias(f"_ctf{i}")
            for i in range(len(terms))
        ],
    )
    parts = []
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}")
        ctf = F.col(f"_ctf{i}")
        smoothed = (tf + mu * ctf / F.col("_sumdl")) / (F.col("_dl") + mu)
        parts.append(F.when(ctf > 0, F.log(smoothed)).otherwise(F.lit(0.0)))
    score = F.round(sum(parts[1:], parts[0]), 6)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .select(id_col, score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rnk", F.row_number().over(w).cast("int"))


def bm25f_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    title_len: int = 8,
    w_title: float = 2.0,
    b_title: float = 0.5,
    w_body: float = 1.0,
    b_body: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25F — the field-weighted ranking web search
    actually runs (Zaragoza, Craswell, Taylor, Saria & Robertson,
    "Microsoft Cambridge at TREC-13", and Robertson & Zaragoza 2009
    §3.3 "simple BM25F"): instead of scoring one bag of words, each
    field f contributes a SOFT-NORMALIZED weighted term frequency

        tf~(t, d) = sum_f  w_f * tf_f(t, d) / B_f(d),
        B_f(d)    = 1 - b_f + b_f * len_f(d) / avglen_f

    and the document scores sum_t idf(t) * tf~ / (k1 + tf~) — weighting
    is applied INSIDE the saturation, which is what distinguishes BM25F
    from naively summing per-field BM25 scores (that double-counts
    saturation; Robertson & Zaragoza §3.3 call it out as the wrong
    linear combination).  Fields here: ``title`` = the first
    ``title_len`` tokens (the reference's markdown converter emits the
    page title as the leading heading line — functions/html.py), and
    ``body`` = the rest; df/idf are whole-document (a term in any field
    counts).  Documents matching no query term are excluded.

    Returns (id_col, score, rnk) — score rounded to 6, rank from 1,
    ties broken by id.

    Scale shape (100 TB): identical to bm25_topk — per-field tf/length
    are zero-shuffle codegen'd projections over the token array (the
    query is tiny and rides in the expression tree; no inverted index
    materialized, no explode), ONE map-side-combined stats aggregate
    broadcast back, TakeOrdered for the top-k; the rnk window sees only
    the k selected rows."""
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    arr = _tok_arr(text_col).alias("_l")

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    split = df.select(F.col(id_col), arr).select(
        id_col,
        F.slice("_l", 1, title_len).alias("_t"),
        F.expr(
            f"slice(_l, {title_len + 1}, greatest(size(_l) - {title_len}, 0))"
        ).alias("_b"),
    )
    base = split.select(
        id_col,
        F.size("_t").cast("long").alias("_lt"),
        F.size("_b").cast("long").alias("_lb"),
        *[
            c
            for i, t in enumerate(terms)
            for c in (
                F.size(F.filter("_t", _eq(t))).cast("long").alias(f"_tt{i}"),
                F.size(F.filter("_b", _eq(t))).cast("long").alias(f"_tb{i}"),
            )
        ],
    )
    stats = base.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_lt").cast("long").alias("_sumlt"),
        F.sum("_lb").cast("long").alias("_sumlb"),
        *[
            F.sum(
                ((F.col(f"_tt{i}") + F.col(f"_tb{i}")) > 0).cast("long")
            ).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    n = F.col("_n")
    bt = (
        1.0 - b_title + (b_title * F.col("_lt")) / (F.col("_sumlt") / n)
    )
    bb = 1.0 - b_body + (b_body * F.col("_lb")) / (F.col("_sumlb") / n)
    parts = []
    for i in range(len(terms)):
        tft, tfb = F.col(f"_tt{i}"), F.col(f"_tb{i}")
        wtf = (w_title * tft) / bt + (w_body * tfb) / bb
        idf = F.log(
            1.0 + ((n - F.col(f"_df{i}")) + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        parts.append(
            F.when((tft + tfb) > 0, (idf * wtf) / (k1 + wtf)).otherwise(
                F.lit(0.0)
            )
        )
    score = F.round(sum(parts[1:], parts[0]), 6)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .select(id_col, score.alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    # rnk over the k already-selected rows (trivial post-TakeOrdered)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rnk", F.row_number().over(w).cast("int"))


def phrase_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Exact consecutive-token phrase matching — the positional-index
    primitive next to BM25's bag-of-words scoring (public recipe: every
    search engine's phrase query; Manning et al., IIR §2.4 positional
    postings).  Returns (id, n_hits) for documents containing the phrase
    at least once, n_hits = number of occurrence positions (overlaps
    counted — "a a a" has two hits of "a a").

    Scale shape (100 TB): NO positional index is materialized — the
    phrase is tiny and rides inside the expression tree; occurrences are
    counted by filtering the position sequence 1..len-L+1 with an
    all-terms-match predicate over the token array.  Pure zero-shuffle
    codegen'd projection, same discipline as bm25_topk's tf terms: the
    classic explode-join positional index would shuffle every token
    position of the corpus to match a constant phrase.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    L = len(terms)
    toks = _tok_arr(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("_t"))

    def hit(i):
        # F.get is 0-based and NULL (not an ANSI error) out of bounds,
        # so the short-document fallback start below is safely false
        cond = F.get(F.col("_t"), i - 1) == terms[0]
        for j in range(1, L):
            cond = cond & (F.get(F.col("_t"), i - 1 + F.lit(j)) == terms[j])
        return cond

    starts = F.sequence(F.lit(1), F.greatest(F.size("_t") - (L - 1), F.lit(1)))
    n = F.size(F.filter(starts, hit)).cast("long")
    return (
        base.select("id", n.alias("n_hits"))
        .where(F.col("n_hits") > 0)
    )


def keyword_extract(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction by integer tf×idf rank.

    The classic per-doc salient-term picker (inverted-index building,
    tag generation, focused-crawl topic seeds).  Deliberately avoids
    ``ln`` — the same bit-stability argument as operators/allpairs.py:
    the idf role is played by the exact integer ratio ``idf_fp =
    N * 1e6 div df(term)`` and ``score_fp = tf * idf_fp``; ranks and
    ties (score desc, term asc) are then engine-exact.

    Plan shape: tokenize → one map-side-combined (id, term) tf rollup →
    one (term) df rollup (distinct-doc counts) → term-keyed join back
    (shuffle join; the term table is corpus-wide so never broadcast by
    default, AQE may) → per-doc top-k window (WindowGroupLimit prunes
    map-side).  The 1-row corpus count rides a broadcast.  Zero Python.
    """
    from pyspark.sql import Window

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    words = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(toks).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("long").alias("_n")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.expr("_n * 1000000 div df").cast("long").alias("idf_fp"),
        )
        .withColumn(
            "score_fp", (F.col("tf") * F.col("idf_fp")).cast("long")
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("score_fp"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_k))
        .select("id", F.col("rank").cast("long").alias("rank"), "term",
                "tf", "idf_fp", "score_fp")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    ``score(d) = sum_r 1 / (k + rank_r(d))`` over the input rankings —
    the standard zero-training way to fuse heterogeneous rankers (here:
    lexical BM25/BM25F lists with link-authority lists), robust because
    only RANKS cross the boundary, never incomparable scores.  Documents
    absent from a ranking contribute 0 from it (truncated-list RRF, the
    common production form); k=60 is the paper's default.

    Returns (id_col, score, rnk): score rounded to 6 — the reciprocal
    terms are summed in the FIXED ranking-list order via coalesce, so
    there is no float accumulation-order dependence — rank from 1, ties
    broken by id.

    Scale shape: rankings are top-k lists (tiny), so the outer-join
    chain broadcasts; on full-corpus rankings the joins degrade
    gracefully to shuffled hash joins on the uniform id.  No window
    until the final rank over the fused short list."""
    assert rankings, "need at least one ranking"
    fused = None
    for i, r in enumerate(rankings):
        part = r.select(
            F.col(id_col), F.col(rank_col).cast("long").alias(f"_r{i}")
        )
        fused = part if fused is None else fused.join(part, id_col, "full")
    terms = [
        F.coalesce(
            1.0 / (F.lit(float(k)) + F.col(f"_r{i}")), F.lit(0.0)
        )
        for i in range(len(rankings))
    ]
    score = F.round(sum(terms[1:], terms[0]), 6)
    scored = fused.select(F.col(id_col), score.alias("score"))
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rnk", F.row_number().over(w).cast("int"))


def ef_posting_layout(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Elias-Fano posting-list sizing next to the VByte d-gap layout
    (:func:`posting_list_layout`): the quasi-succinct encoding (Elias
    1974; Vigna, "Quasi-succinct indices", WSDM 2013 — the layout behind
    Lucene's FST-adjacent postings and most modern engines) stores a
    monotone id list over universe U in

        ef_bits = n*l + n + (U >> l),   l = max(0, floor(log2(U / n)))

    (n*l lower-bit words + a unary upper-bits stream of n ones and
    U >> l zeros).  Byte-aligned VByte cannot go under 8 bits/posting;
    EF routinely does (~2 + log2(U/n)) and on monotone id lists wins
    nearly everywhere — VByte's residual case is decode speed, not
    space.  This report quantifies the space side per term before
    committing a 100-TB corpus to an index build.

    Integer-exact cross-engine contract: floor(log2(x)) is computed as
    ``length(bin(x div 1)) - 1`` on the INTEGER quotient U div n (for
    x >= 1, floor(log2(x)) == floor(log2(floor(x))) — both engines'
    ``bin`` is exact where float log2 has ulp risk at powers of two),
    and ``U >> l`` is an integer shift.  No libm anywhere.

    Returns (tok, df_count, vbyte_bits, ef_bits, ef_wins).

    Scale shape: :func:`posting_list_layout`'s one distinct + one
    term-window + one rollup, plus a 1-row broadcast universe; the EF
    arithmetic is a pure projection."""
    base = posting_list_layout(df, id_col, text_col)
    universe = df.agg(
        (F.max(F.col(id_col)) + 1).cast("long").alias("_u")
    )
    l_expr = F.greatest(
        F.length(F.bin(F.expr("_u div df_count"))) - 1, F.lit(0)
    ).cast("long")
    return (
        base.crossJoin(F.broadcast(universe))
        .withColumn("_l", l_expr)
        .select(
            "tok",
            "df_count",
            (F.col("varint_bytes") * 8).cast("long").alias("vbyte_bits"),
            (
                F.col("df_count") * F.col("_l")
                + F.col("df_count")
                + F.expr("shiftright(_u, cast(_l AS INT))")
            ).cast("long").alias("ef_bits"),
        )
        .withColumn("ef_wins", F.col("ef_bits") < F.col("vbyte_bits"))
    )


def _rm3_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    mu: float,
    fb_docs: int,
    fb_terms: int,
    lambda_ppm: int,
):
    """Shared RM3 pipeline head (Lavrenko & Croft, SIGIR 2001 relevance
    models; the RM3 query/model interpolation of Abdul-Jaleel et al.,
    TREC 2004 — the standard public pseudo-relevance-feedback recipe,
    the default feedback model in Anserini/Galago).  Returns
    ``(weights, consts, toks, dl)`` where ``weights`` is the tiny
    (tok, weight_fp, pc) query-model table, ``consts`` the 1-row
    (c_fp, w_tot) scoring constants, and toks/dl the corpus side tables
    reused by :func:`rm3_topk`.

    Every cross-engine-fragile float reduction is pinned to integers
    (the kneser_ney micro-unit recipe):

    1. *Initial retrieval*: P(Q|D) is the PRODUCT of Dirichlet-smoothed
       term probabilities in fixed query order — multiplication and
       division are IEEE exactly-rounded, so q_lik is bit-identical
       across engines (no ln/exp).  Query terms with collection
       frequency 0 contribute factor 1 (pinned; q216's drop rule in
       product space).  Top ``fb_docs`` by (q_lik DESC, id).
    2. *Relevance model RM1*: per feedback doc, w_fp = round(q_lik /
       max_qlik * 1e12) — ratio-to-max normalization keeps int64 safe
       and drops nothing that matters; per term, contribution
       ``(w_fp * tf) div dl`` (integer floor division = exact), summed
       exactly.  Top ``fb_terms`` expansion terms by (rm1_fp DESC, tok),
       original query terms excluded, rm1_fp > 0 required.
    3. *RM3 interpolation* in ppm integers: query terms get
       ``lambda_ppm div |Q|`` each; expansion term w gets
       ``((1e6 - lambda_ppm) * rm1_fp_w) div S`` with S the exact
       integer sum over the selected terms.  (int64-safe for
       lambda_ppm >= 1e5: rm1_fp < 1e13 by construction.)
    4. *Scoring decomposition*: ln P_mu(w|D) = ln(tf + mu*pc_w)
       - ln(dl + mu), so score(D) in micro-nat*ppm units is
       ``sum_{w in D} round(weight_fp * ln((tf+mu*pc)/(mu*pc)))
       + C_fp - round(W_tot * ln(dl+mu))`` with C_fp =
       sum_w round(weight_fp * ln(mu*pc_w)) and W_tot = sum_w weight_fp
       — the sparse-gain trick: only (doc, present-term) pairs join,
       absent terms ride the per-query constant.

    Scale shape (100 TB): corpus stats are two map-side-combined
    rollups (toks, ctf) + a 1-row sumdl broadcast; initial retrieval is
    the zero-shuffle array-filter projection + TakeOrdered(fb_docs);
    the feedback set (10 rows) and the weight table (<= |Q|+fb_terms
    rows) are broadcast everywhere they join; final scoring is one
    broadcast semi-join of toks against ~13 terms, one groupBy(id)
    integer sum, TakeOrdered(k).  No collect, no Python, no window
    until the k selected rows.
    """
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    nq = len(terms)
    if nq == 0:
        raise ValueError("empty query")
    if lambda_ppm < 100_000 or lambda_ppm > 1_000_000:
        raise ValueError("lambda_ppm pinned to [1e5, 1e6] for int64 safety")
    arr = _tok_arr(text_col).alias("_l")

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    base = df.select(F.col(id_col).alias("id"), arr).select(
        "id",
        F.size("_l").cast("long").alias("dl"),
        *[
            F.size(F.filter("_l", _eq(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.sum("dl").cast("long").alias("_sumdl"),
        *[
            F.sum(F.col(f"_tf{i}")).cast("long").alias(f"_ctf{i}")
            for i in range(nq)
        ],
    )
    factors = []
    for i in range(nq):
        tf, ctf = F.col(f"_tf{i}"), F.col(f"_ctf{i}")
        factors.append(
            F.when(
                ctf > 0,
                (tf + mu * ctf / F.col("_sumdl")) / (F.col("dl") + mu),
            ).otherwise(F.lit(1.0))
        )
    q_lik = factors[0]
    for fct in factors[1:]:
        q_lik = q_lik * fct
    fb = (
        base.crossJoin(F.broadcast(stats))
        .select("id", "dl", q_lik.alias("q_lik"))
        .orderBy(F.col("q_lik").desc(), F.col("id"))
        .limit(fb_docs)
    )
    maxq = fb.agg(F.max("q_lik").alias("_maxq"))
    fb_w = fb.crossJoin(F.broadcast(maxq)).select(
        "id",
        "dl",
        F.round(F.col("q_lik") / F.col("_maxq") * 1e12, 0)
        .cast("long")
        .alias("w_fp"),
    )

    toks = (
        df.select(
            F.col(id_col).alias("id"), F.explode(_tok_arr(text_col)).alias("tok")
        )
        .groupBy("id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dl = df.select(
        F.col(id_col).alias("id"), F.size(_tok_arr(text_col)).cast("long").alias("dl")
    )
    ctf = toks.groupBy("tok").agg(F.sum("tf").cast("long").alias("ctf"))
    sumdl = dl.agg(F.sum("dl").cast("long").alias("_sumdl"))

    rm1 = (
        toks.join(F.broadcast(fb_w), "id")
        .select("tok", F.expr("(w_fp * tf) div dl").alias("c_fp"))
        .groupBy("tok")
        .agg(F.sum("c_fp").cast("long").alias("rm1_fp"))
        .where(~F.col("tok").isin(terms) & (F.col("rm1_fp") > 0))
        .orderBy(F.col("rm1_fp").desc(), F.col("tok"))
        .limit(fb_terms)
    )
    s_tot = rm1.agg(F.sum("rm1_fp").cast("long").alias("_s"))
    exp_w = rm1.crossJoin(F.broadcast(s_tot)).select(
        "tok",
        "rm1_fp",
        F.expr(f"(({1_000_000 - lambda_ppm}) * rm1_fp) div _s")
        .cast("long")
        .alias("weight_fp"),
    )
    spark = df.sparkSession
    q_w = spark.createDataFrame(
        [(t, 0, lambda_ppm // nq) for t in terms],
        "tok string, rm1_fp long, weight_fp long",
    )
    weights = (
        q_w.unionByName(exp_w)
        .join(ctf, "tok", "left")
        .crossJoin(F.broadcast(sumdl))
        .where(F.coalesce(F.col("ctf"), F.lit(0)) > 0)
        .select(
            "tok",
            "rm1_fp",
            "weight_fp",
            (F.col("ctf") / F.col("_sumdl")).alias("pc"),
        )
    )
    consts = weights.agg(
        F.sum(
            F.round(F.col("weight_fp") * F.log(mu * F.col("pc")), 0).cast(
                "long"
            )
        )
        .cast("long")
        .alias("c_fp"),
        F.sum("weight_fp").cast("long").alias("w_tot"),
    )
    return weights, consts, toks, dl


def rm3_expansion(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    mu: float = 2000.0,
    fb_docs: int = 10,
    fb_terms: int = 10,
    lambda_ppm: int = 500_000,
) -> DataFrame:
    """The RM3 query model itself: one row per model term —
    (tok, rm1_fp, weight_fp, is_original) — original query terms with
    rm1_fp = 0 and weight lambda_ppm div |Q|, expansion terms with their
    exact-integer relevance-model mass and interpolated ppm weight.
    Terms absent from the collection are dropped (q216's pinned rule).
    See :func:`_rm3_model` for the full pinned contract."""
    weights, _, _, _ = _rm3_model(
        df, id_col, text_col, query_terms, mu, fb_docs, fb_terms, lambda_ppm
    )
    qset = [t.lower() for t in query_terms]
    return weights.select(
        "tok",
        "rm1_fp",
        "weight_fp",
        F.col("tok").isin(qset).alias("is_original"),
    )


def rm3_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    mu: float = 2000.0,
    fb_docs: int = 10,
    fb_terms: int = 10,
    lambda_ppm: int = 500_000,
    k: int = 20,
) -> DataFrame:
    """Top-k documents under the RM3-expanded query: KL/query-likelihood
    scoring of the interpolated model against each document's Dirichlet-
    smoothed LM, in exact micro-nat*ppm integers (score_fp).  Returns
    (id_col, score_fp, rnk), ties by id.  See :func:`_rm3_model`."""
    weights, consts, toks, dl = _rm3_model(
        df, id_col, text_col, query_terms, mu, fb_docs, fb_terms, lambda_ppm
    )
    gains = (
        toks.join(F.broadcast(weights), "tok")
        .select(
            "id",
            F.round(
                F.col("weight_fp")
                * F.log(
                    (F.col("tf") + mu * F.col("pc")) / (mu * F.col("pc"))
                ),
                0,
            )
            .cast("long")
            .alias("g_fp"),
        )
        .groupBy("id")
        .agg(F.sum("g_fp").cast("long").alias("gain_fp"))
    )
    scored = (
        dl.join(gains, "id", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col("id").alias(id_col),
            (
                F.coalesce(F.col("gain_fp"), F.lit(0))
                + F.col("c_fp")
                - F.round(
                    F.col("w_tot") * F.log(F.col("dl") + mu), 0
                ).cast("long")
            ).cast("long").alias("score_fp"),
        )
        .orderBy(F.col("score_fp").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score_fp").desc(), F.col(id_col))
    return scored.withColumn("rnk", F.row_number().over(w).cast("int"))


def sdm_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    mu: float = 2000.0,
    k: int = 20,
    w_term: float = 0.85,
    w_ordered: float = 0.10,
    w_unordered: float = 0.05,
    window: int = 8,
) -> DataFrame:
    """Sequential Dependence Model ranking (Metzler & Croft, SIGIR 2005
    — the MRF retrieval model that consistently beats bag-of-words QL
    and ships as Galago's / Anserini's ``sdm`` operator): three feature
    families over the query,

        score(D,Q) = w_T  sum_t        ln P_mu(t | D)
                   + w_O  sum_(a,b)    ln P_mu(#1(a b) | D)
                   + w_U  sum_(a,b)    ln P_mu(#uw8(a b) | D)

    with (a,b) ranging over ADJACENT query-term pairs, #1 the exact
    ordered-adjacency count, #uw8 the unordered-window co-occurrence,
    and every feature Dirichlet-smoothed against its own collection
    frequency over the shared collection length (the Galago/Anserini
    convention).  Default weights (0.85, 0.10, 0.05) are the paper's.

    Pinned semantics so the SQL oracle reproduces it exactly:

    - ordered count = positions i with tok[i]=a and tok[i+1]=b
      (overlaps counted — the phrase_counts contract);
    - unordered count = ORDERED position pairs (i in pos(a), j in
      pos(b), i != j, |i - j| <= window-1) — each co-occurrence
      within a ``window``-term span counts once per direction pair;
    - features whose collection frequency is 0 contribute 0 (q216's
      pinned drop);
    - every doc scores; round-6 + id tie-break before ranking.

    Scale shape (100 TB): the query is tiny and every per-doc count —
    tf, ordered, windowed — is a zero-shuffle codegen'd projection over
    the token array (position lists of QUERY terms only; no positional
    index materialized, no explode).  Collection stats are ONE
    map-side-combined 1-row aggregate re-entering via broadcast; top-k
    is TakeOrderedAndProject.  Identical discipline to bm25_topk.

    Returns (id_col, score, rnk)."""
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    pairs = list(zip(terms, terms[1:]))
    arr = _tok_arr(text_col).alias("_l")

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    def _pos(term: str):
        # index-aware transform (0 marks non-matches, filtered out): an
        # empty doc yields an empty position list, where a naive
        # sequence(1, size) would DESCEND to [1, 0] and element_at would
        # raise on the empty array
        marked = F.transform(
            F.col("_l"),
            lambda x, i: F.when(x == F.lit(term), i + 1).otherwise(F.lit(0)),
        )
        return F.filter(marked, lambda p: p > 0)

    def _ordered(a: str, b: str):
        starts = F.sequence(
            F.lit(1), F.greatest(F.size("_l") - 1, F.lit(1))
        )
        return F.size(
            F.filter(
                starts,
                lambda i: (F.get(F.col("_l"), i - 1) == a)
                & (F.get(F.col("_l"), i) == b),
            )
        ).cast("long")

    def _unordered(a: str, b: str):
        span = F.lit(window - 1)
        return F.aggregate(
            F.transform(
                _pos(a),
                lambda i: F.size(
                    F.filter(
                        _pos(b),
                        lambda j: (j != i) & (F.abs(j - i) <= span),
                    )
                ),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("long")

    base = df.select(F.col(id_col), arr).select(
        id_col,
        F.size("_l").cast("long").alias("_dl"),
        *[
            F.size(F.filter("_l", _eq(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
        *[
            _ordered(a, b).alias(f"_o{j}")
            for j, (a, b) in enumerate(pairs)
        ],
        *[
            _unordered(a, b).alias(f"_u{j}")
            for j, (a, b) in enumerate(pairs)
        ],
    )
    feat_cols = (
        [f"_tf{i}" for i in range(len(terms))]
        + [f"_o{j}" for j in range(len(pairs))]
        + [f"_u{j}" for j in range(len(pairs))]
    )
    stats = base.agg(
        F.sum("_dl").cast("long").alias("_sumdl"),
        *[F.sum(c).cast("long").alias(f"_cf{c}") for c in feat_cols],
    )
    weights = (
        [w_term] * len(terms)
        + [w_ordered] * len(pairs)
        + [w_unordered] * len(pairs)
    )
    parts = []
    for c, wgt in zip(feat_cols, weights):
        cnt, cf = F.col(c), F.col(f"_cf{c}")
        smoothed = (cnt + mu * cf / F.col("_sumdl")) / (F.col("_dl") + mu)
        parts.append(
            F.when(cf > 0, F.lit(wgt) * F.log(smoothed)).otherwise(F.lit(0.0))
        )
    score = F.round(sum(parts[1:], parts[0]), 6)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .select(id_col, score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rnk", F.row_number().over(w).cast("int"))


def wand_prune_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """WAND / MaxScore pruning-potential audit (Broder, Carmel,
    Herscovici, Soffer & Zien, CIKM 2003 "Efficient query evaluation
    using a two-level retrieval process"; Turtle & Flood 1995 MaxScore).

    WAND skips a candidate document without scoring it when the sum of
    its query terms' UPPER-BOUND contributions cannot reach the current
    top-k threshold theta.  This operator measures how much a WAND
    index would prune for a given query on this corpus: per-term upper
    bounds, the exact theta (k-th best full BM25 score, q74 contract),
    and the fraction of candidate documents (>= 1 query term) that are
    provably skippable.  High skip_ppm = the query is amenable to
    dynamic pruning; near-zero = the terms' bounds are too loose.

    Pinned semantics: contributions use the exact q74 BM25 expression
    shapes (each a per-row scalar chain, never a cross-row float sum);
    ub_t = round(max contribution of t over all docs, 6); theta =
    min score of the top-k (score > 0, ties by id); the skippability
    sum adds the ROUNDED ub values in fixed term order.  Docs matching
    no term are not candidates (WAND never visits them at all).

    Returns one row per query term: (term, df, ub, theta, n_cands,
    n_skippable, skip_ppm) with the corpus-level columns replicated.

    Scale shape (100 TB): per-doc tf columns are array filters off the
    scan (no explode); corpus stats, upper bounds, and theta are three
    1-row broadcast aggregates (theta's TakeOrdered is mergeable); the
    skippability pass is one more map-side-combined aggregate over the
    scored scan.  No windows over raw data, no joins, no Python.
    """
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    arr = _tok_arr(text_col).alias("_l")

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    base = df.select(F.col(id_col), arr).select(
        id_col,
        F.size("_l").cast("long").alias("_dl"),
        *[
            F.size(F.filter("_l", _eq(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_dl").cast("long").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    avgdl = F.col("_sumdl") / F.col("_n")
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            1.0
            + (F.col("_n") - F.col(f"_df{i}") + 0.5)
            / (F.col(f"_df{i}") + 0.5)
        )
        norm = tf + k1 * (1.0 - b + b * F.col("_dl") / avgdl)
        contribs.append(
            F.when(tf > 0, idf * tf * (k1 + 1.0) / norm).otherwise(F.lit(0.0))
        )
    score = F.round(sum(contribs[1:], contribs[0]), 6)
    scored = base.crossJoin(F.broadcast(stats)).select(
        id_col,
        *[F.col(f"_tf{i}") for i in range(len(terms))],
        *[c.alias(f"_c{i}") for i, c in enumerate(contribs)],
        score.alias("score"),
    )
    ubs = scored.agg(
        *[
            F.round(F.max(f"_c{i}"), 6).alias(f"_ub{i}")
            for i in range(len(terms))
        ]
    )
    theta = (
        scored.where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .agg(F.min("score").alias("theta"))
    )
    flagged = (
        scored.crossJoin(F.broadcast(ubs))
        .crossJoin(F.broadcast(theta))
        .withColumn(
            "_anyt",
            sum(
                [(F.col(f"_tf{i}") > 0).cast("int") for i in range(len(terms))],
                F.lit(0),
            )
            > 0,
        )
        .withColumn(
            "_ubsum",
            sum(
                [
                    F.when(F.col(f"_tf{i}") > 0, F.col(f"_ub{i}")).otherwise(
                        F.lit(0.0)
                    )
                    for i in range(1, len(terms))
                ],
                F.when(F.col("_tf0") > 0, F.col("_ub0")).otherwise(F.lit(0.0)),
            ),
        )
    )
    summary = flagged.where(F.col("_anyt")).agg(
        F.count("*").cast("long").alias("n_cands"),
        F.sum((F.col("_ubsum") < F.col("theta")).cast("long"))
        .cast("long")
        .alias("n_skippable"),
    )
    term_rows = (
        stats.crossJoin(F.broadcast(ubs))
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.col(f"_df{i}").alias("df"),
                            F.col(f"_ub{i}").alias("ub"),
                        )
                        for i, t in enumerate(terms)
                    ]
                )
            ).alias("e")
        )
        .select("e.term", "e.df", "e.ub")
    )
    return (
        term_rows.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(summary))
        .select(
            "term",
            "df",
            "ub",
            "theta",
            "n_cands",
            "n_skippable",
            F.expr("n_skippable * CAST(1000000 AS BIGINT) DIV n_cands").alias(
                "skip_ppm"
            ),
        )
        .orderBy("term")
    )
