"""Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
2016) — the tokenizer-fitting step of a training-data pipeline, built
ENTIRELY from JVM-side higher-order array expressions (no Python in any
per-row path; the only driver work is one 1-row collect per merge).

Semantics (pinned, matched by the pure-Python reference in tests):
- the corpus compacts to its word VOCABULARY (word, occurrence count)
  first — pair statistics and re-segmentation then run over |vocab|
  rows, not token occurrences (the q125 discipline; at 100 TB the vocab
  is millions of rows while occurrences are trillions);
- a word's initial segmentation is its character sequence;
- each merge step picks the adjacent symbol pair with the highest
  occurrence-weighted count (ties: lexicographically smallest pair), and
  rewrites every segmentation by the standard greedy LEFT-TO-RIGHT
  single-pass fold: ... a b ... -> ... ab ...; a fresh merge result does
  not cascade within the same step (pair (ab, b) is a different pair);
- encoding applies the merge list in training order.

Scale shape: training runs n_merges rounds of ONE map-side-combined
pair aggregate + a 1-row driver collect; segmentations update as a pure
projection (localCheckpoint per round keeps lineage O(1)).  Encoding is
a zero-shuffle projection chain — merges ride as literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm_score import TOKEN_SPLIT


def _apply_merge(segs: Column, a: str, b: str) -> Column:
    """Greedy left-to-right single-pass merge of adjacent (a, b) -> ab
    as an aggregate fold — the exact BPE rewrite rule."""
    ab = a + b
    return F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    from ..functions.text import word_vocab

    return word_vocab(df, text_col)


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 20
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    list in training order."""
    vocab = _word_vocab(df, text_col).select(
        "word", "cnt", F.split(F.col("word"), "").alias("segs")
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(F.col("segs"), 1, F.size("segs") - 1),
                    F.slice(F.col("segs"), 2, F.size("segs") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn(
            "segs", _apply_merge(F.col("segs"), a, b)
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply a trained merge list to the corpus: (id, n_words,
    n_chars_tokens, n_bpe_tokens, tokens) where tokens is the full BPE
    segmentation of the doc's word sequence (word order kept, words
    segmented independently).  Zero shuffle — one projection chain with
    the merges as literals."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != F.lit("")
    )
    out = df.select(
        F.col(id_col).alias("id"), toks.alias("_words")
    ).withColumn("_segs", F.transform(F.col("_words"), lambda w: F.split(w, "")))
    for a, b in merges:
        out = out.withColumn(
            "_segs",
            F.transform(F.col("_segs"), lambda s: _apply_merge(s, a, b)),
        )
    return out.select(
        "id",
        F.size("_words").cast("long").alias("n_words"),
        F.aggregate(
            F.col("_words"),
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.length(w),
        ).alias("n_char_tokens"),
        F.aggregate(
            F.col("_segs"),
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.size(s),
        ).alias("n_bpe_tokens"),
        F.flatten(F.col("_segs")).alias("tokens"),
    )
