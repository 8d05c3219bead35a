"""The one-call training-data preparation pipeline.

Composes the engine's LLM-data operators into the flow a 100 TB corpus
actually runs: annotate -> filter -> exact dedup -> near-dup group dedup ->
chunk. Every stage is the already-oracle-verified operator; this module
only wires them, so the scale properties compose: one shuffle for exact
dedup (md5 key), LSH band joins for near-dup (never all-pairs), canonical
representatives via connected components, shuffle-free chunking
(mapInPandas flat-map).

Usage::

    from eget_spark.pipeline import prepare_training_data
    chunks = prepare_training_data(docs)               # defaults
    chunks = prepare_training_data(
        docs, min_quality=0.6, languages=["en", "de"], chunker="sentence"
    )
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.text import (
    char_entropy_df,
    lang_id_df,
    quality_score,
    shingles,
    stopword_ratio,
    token_count,
)
from .operators.chunker import chunk_semantic, chunk_sentences
from .operators.dedup import dedup_groups, minhash_lsh_pairs, srp_lsh_pairs
from .operators.pii import pii_counts, redact_pii


@dataclass
class PrepResult:
    chunks: DataFrame  # (doc_id, position, content, ...) of surviving docs
    docs: DataFrame  # annotated surviving docs (id, text, lang, quality, ...)
    dropped: DataFrame  # (id, reason) for every document filtered out


def prepare_training_data(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    max_stopword_ratio: float | None = None,
    min_entropy: float | None = None,
    languages: list[str] | None = None,
    near_dup: bool = True,
    near_dup_threshold: float = 0.85,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    chunker: str = "semantic",
    embeddings: DataFrame | None = None,
    emb_vec_col: str = "embedding",
    emb_threshold: float = 0.95,
    scrub_pii: bool = False,
    gopher_rules: bool = False,
    max_dup_line_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
    min_lm_score: float | None = None,
    min_flesch: float | None = None,
    adaptive_quality_den: int | None = None,
    best_representative: bool = False,
    source_weights: dict[str, float] | None = None,
    source_col: str = "source",
    mix_seed: str = "",
    split_by: str | None = None,
    split_weights: list[int] | None = None,
    split_seed: str = "",
) -> PrepResult:
    """Annotate, filter, dedup (exact + near-dup groups), and chunk.

    ``min_entropy`` adds the char-entropy floor (drops repetition/noise
    docs).  ``embeddings`` — optional (id_col, emb_vec_col) table: adds a
    semantic near-dup stage via SRP LSH (cosine >= ``emb_threshold``
    within shared hyperplane bands) after the text near-dup stage.
    ``gopher_rules=True`` adds the Gopher/MassiveText Table-A1 stage:
    documents must pass the zero-shuffle word/line/symbol/stopword rules
    (``gopher_pass``) AND stay under the repetition ceilings
    (``max_dup_line_frac``, ``max_top_bigram_frac`` — the paper's 0.30 /
    0.20); dropped docs get reason ``gopher_filter``.  ``min_lm_score``
    adds the CCNet-style unigram-LM floor (mean token log-prob, natural
    log, trained on the post-quality corpus itself); reason
    ``lm_score_filter``.  ``scrub_pii=True`` redacts emails/IPv4s/phones
    (operators/pii.py)
    AFTER dedup — so dedup keys see the raw bytes and a redaction can
    never merge two distinct documents — and BEFORE chunking, so chunks
    inherit the scrubbed text; per-doc counters land on ``docs`` as
    ``n_pii_emails`` / ``n_pii_ips`` / ``n_pii_phones``.  Map-side only:
    the stage adds zero shuffles to the pipeline.

    Round-5 stages: ``min_flesch`` adds the readability floor (zero
    shuffle — a pure column); ``adaptive_quality_den`` drops each
    predicted language's bottom 1/den quality fraction (FineWeb-style
    per-group cutoffs; reason ``adaptive_quality_filter``);
    ``best_representative=True`` keeps the HIGHEST-quality member of
    each near-dup cluster instead of the lowest id; ``source_weights``
    applies engine-exact per-source Bernoulli keep rates AFTER dedup
    (the corpus-mixing step; unlisted sources keep rate 1.0; reason
    ``source_sampled_out``); ``split_by`` adds a leakage-safe
    group-consistent ``split`` column (8/1/1 train/val/test by default)
    to the surviving docs."""
    carry = [
        c
        for c in dict.fromkeys(
            ([source_col] if source_weights is not None else [])
            + ([split_by] if split_by else [])
        )
        if c in docs.columns and c not in (id_col, text_col)
    ]
    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text"), *carry
    )
    annotated = (
        base.join(lang_id_df(base, "id", "text"), "id", "left")
        .withColumn("quality", quality_score(F.col("text")))
        .withColumn("stop_ratio", stopword_ratio(F.col("text")))
        .withColumn("n_tokens", token_count(F.col("text")))
    )
    if min_entropy is not None:
        annotated = annotated.join(char_entropy_df(base, "id", "text"), "id", "left")
    if min_flesch is not None:
        from .functions.text import flesch_score

        annotated = annotated.withColumn("flesch", flesch_score(F.col("text")))

    keep = F.col("quality") >= F.lit(min_quality)
    if max_stopword_ratio is not None:
        keep = keep & (F.col("stop_ratio") <= F.lit(max_stopword_ratio))
    if min_entropy is not None:
        keep = keep & (F.col("char_entropy") >= F.lit(min_entropy))
    if min_flesch is not None:
        keep = keep & F.col("flesch").isNotNull() & (
            F.col("flesch") >= F.lit(min_flesch)
        )
    if languages:
        keep = keep & F.col("pred_lang").isin(languages)
    quality_pass = annotated.where(keep)
    dropped = annotated.where(~keep).select(
        "id", F.lit("quality_filter").alias("reason")
    )

    if adaptive_quality_den is not None:
        from .operators.quality_rules import adaptive_quality_filter

        aq = adaptive_quality_filter(
            quality_pass, "pred_lang", "quality", "id", 1, adaptive_quality_den
        )
        dropped = dropped.unionByName(
            aq.where(~F.col("keep")).select(
                "id", F.lit("adaptive_quality_filter").alias("reason")
            )
        )
        quality_pass = quality_pass.join(
            aq.where(F.col("keep")).select("id"), "id", "left_semi"
        )

    if gopher_rules:
        from .operators.quality_rules import gopher_signals, repetition_signals

        sig = gopher_signals(quality_pass, "id", "text").select(
            "id", "gopher_pass"
        )
        rep = repetition_signals(quality_pass, "id", "text").select(
            "id", "dup_line_frac", "top_bigram_char_frac"
        )
        verdict = sig.join(rep, "id").withColumn(
            "_gk",
            F.col("gopher_pass")
            & (F.col("dup_line_frac") <= F.lit(max_dup_line_frac))
            & (F.col("top_bigram_char_frac") <= F.lit(max_top_bigram_frac)),
        )
        dropped = dropped.unionByName(
            verdict.where(~F.col("_gk")).select(
                "id", F.lit("gopher_filter").alias("reason")
            )
        )
        quality_pass = quality_pass.join(
            verdict.where(F.col("_gk")).select("id"), "id", "left_semi"
        )

    if min_lm_score is not None:
        from .operators.lm_score import unigram_doc_scores

        lm = unigram_doc_scores(quality_pass, "id", "text").select(
            "id", "lm_score"
        )
        dropped = dropped.unionByName(
            lm.where(
                F.col("lm_score").isNull()
                | (F.col("lm_score") < F.lit(min_lm_score))
            ).select("id", F.lit("lm_score_filter").alias("reason"))
        )
        quality_pass = quality_pass.join(
            lm.where(F.col("lm_score") >= F.lit(min_lm_score)).select("id"),
            "id",
            "left_semi",
        )

    # exact dedup: min-id representative per md5(text) — one shuffle on a
    # short key
    exact_keep = quality_pass.withColumn("_h", F.md5(F.col("text"))).withColumn(
        "_keep", F.col("id") == F.min("id").over(Window.partitionBy("_h"))
    )
    survivors = exact_keep.where(F.col("_keep")).drop("_h", "_keep")
    dropped = dropped.unionByName(
        exact_keep.where(~F.col("_keep")).select(
            "id", F.lit("exact_duplicate").alias("reason")
        )
    )

    if near_dup:
        # LSH emits CANDIDATES (docs sharing a band minimum — glue phrases
        # alone can collide); true Jaccard verification before grouping is
        # what keeps distinct documents out of dedup clusters. The verify
        # join touches only candidate pairs, never all-pairs.
        candidates = minhash_lsh_pairs(
            survivors, "id", "text", num_hashes=num_hashes, bands=bands, k=shingle_k
        )
        sh = survivors.select(
            "id", F.array_distinct(shingles(F.col("text"), shingle_k)).alias("sh")
        )
        pairs = (
            candidates.join(
                sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sha")), "id_a"
            )
            .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("shb")), "id_b")
            .where(
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb"))
                >= F.lit(near_dup_threshold)
            )
            .select("id_a", "id_b")
        )
        if best_representative:
            from .operators.dedup import select_representatives

            groups = select_representatives(survivors, pairs, "id", "quality")
        else:
            groups = dedup_groups(survivors, pairs, "id")
        survivors = survivors.join(
            groups.where(~F.col("is_duplicate")).select("id"), "id", "left_semi"
        )
        dropped = dropped.unionByName(
            groups.where(F.col("is_duplicate")).select(
                "id", F.lit("near_duplicate").alias("reason")
            )
        )

    if embeddings is not None:
        # semantic near-dup: SRP hyperplane bands -> exact cosine verify —
        # candidates stay O(n * dup_rate) (same profile as the text LSH)
        emb = embeddings.select(
            F.col(id_col).alias("id"), F.col(emb_vec_col).alias("v")
        ).join(survivors.select("id"), "id", "left_semi")
        epairs = srp_lsh_pairs(emb, "id", "v", threshold=emb_threshold).select(
            "id_a", "id_b"
        )
        egroups = dedup_groups(survivors, epairs, "id")
        survivors = survivors.join(
            egroups.where(~F.col("is_duplicate")).select("id"), "id", "left_semi"
        )
        dropped = dropped.unionByName(
            egroups.where(F.col("is_duplicate")).select(
                "id", F.lit("embedding_near_duplicate").alias("reason")
            )
        )

    if source_weights is not None:
        from functools import reduce as _reduce

        from .operators.sampling import bernoulli_keep

        prob = _reduce(
            lambda acc, kv: acc.when(
                F.col(source_col) == F.lit(kv[0]), F.lit(float(kv[1]))
            ),
            sorted(source_weights.items()),
            F.when(F.lit(False), F.lit(0.0)),
        ).otherwise(F.lit(1.0))
        cond = bernoulli_keep("id", prob, seed=mix_seed)
        dropped = dropped.unionByName(
            survivors.where(~cond).select(
                "id", F.lit("source_sampled_out").alias("reason")
            )
        )
        survivors = survivors.where(cond)

    if split_by is not None:
        from .operators.sampling import split_by_group

        survivors = split_by_group(
            survivors, split_by, weights=split_weights, seed=split_seed
        )

    if scrub_pii:
        n_e, n_i, n_p = pii_counts(F.col("text"))
        survivors = (
            survivors.withColumn("n_pii_emails", n_e)
            .withColumn("n_pii_ips", n_i)
            .withColumn("n_pii_phones", n_p)
            .withColumn("text", redact_pii(F.col("text")))
        )

    # the chunkers' output contract keys docs by string id (engine doc ids
    # are URLs); non-string ids are cast for the chunk table only
    chunk_in = survivors.select(F.col("id").cast("string").alias("id"), "text")
    if chunker == "semantic":
        chunks = chunk_semantic(chunk_in, id_col="id", text_col="text")
    elif chunker == "sentence":
        chunks = chunk_sentences(chunk_in, id_col="id", text_col="text")
    else:
        raise ValueError(f"unknown chunker {chunker!r}")
    return PrepResult(chunks=chunks, docs=survivors, dropped=dropped)
