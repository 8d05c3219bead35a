"""Train/test contamination detection (training-data extension).

The standard decontamination pass for LLM corpora (the GPT-3 appendix-C
recipe, reused by The Pile / Llama reports — public methodology): a
training document is contaminated if it shares at least one word n-gram
(canonically n=13) with any benchmark/eval text; contaminated documents
are dropped or flagged before training.

Spark shape (the 100 TB story): the benchmark side is tiny (eval sets are
thousands of texts), so its distinct n-gram set BROADCASTS; the corpus
side streams through a broadcast hash join with NO shuffle — the only
shuffles are the per-doc shingle window (keyed on doc id, uniform) and
the final per-doc aggregate over the (rare) matching rows.  Nothing about
the corpus ever collects; n-grams are produced by the codegen'd
shingle_rows path shared with minhash dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingle_rows


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    n: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(id, bench_id, n_shared) for every (corpus doc, benchmark text)
    pair sharing >= 1 word n-gram; ``n_shared`` counts DISTINCT shared
    n-grams.  A benchmark text that itself appears in the corpus matches
    itself — by design (that is contamination)."""
    bench_id_col = bench_id_col or id_col
    bench_text_col = bench_text_col or text_col
    # shingle_rows clusters the corpus grams by doc id (one doc-level
    # exchange): the distinct, the (id, bench_id) pair aggregate below,
    # and the per-doc rollup in contamination_flags are all then
    # exchange-free — the round-5 form paid a (id, s) distinct exchange
    # plus a pair-agg exchange on top of it (guide §2.4)
    d = shingle_rows(docs, id_col, text_col, n).distinct()
    b = (
        shingle_rows(benchmark, bench_id_col, bench_text_col, n)
        .distinct()
        .withColumnRenamed("id", "bench_id")
    )
    if broadcast_bench:
        b = F.broadcast(b)
    return (
        d.join(b, "s")
        .groupBy("id", "bench_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    **kw,
) -> DataFrame:
    """Per contaminated corpus doc: (id, n_bench_texts, n_shared_grams).
    Docs absent from the result are clean."""
    pairs = contamination_pairs(docs, benchmark, id_col, text_col, n=n, **kw)
    return pairs.groupBy("id").agg(
        F.count("*").cast("long").alias("n_bench_texts"),
        F.sum("n_shared").cast("long").alias("n_shared_grams"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    **kw,
) -> tuple[DataFrame, DataFrame]:
    """(clean, flagged): drop every corpus doc sharing an n-gram with the
    benchmark.  The anti-join keys on the (tiny) flagged id set, so the
    clean side is one broadcast anti-join over the corpus — no corpus
    shuffle."""
    flagged = contamination_flags(docs, benchmark, id_col, text_col, n=n, **kw)
    clean = docs.join(
        F.broadcast(flagged.select(F.col("id").alias(id_col))),
        id_col,
        "left_anti",
    )
    return clean, flagged


def split_leakage(
    docs: DataFrame,
    split_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Cross-split n-gram leakage audit — the check a team runs AFTER
    train/val/test assignment (Lee et al. 2022: duplicated n-grams
    across the split boundary inflate eval scores).  Returns one row per
    unordered split pair: (split_a, split_b, n_grams_shared = distinct
    n-grams present in both splits, n_collisions = sum over shared grams
    of n_docs_a * n_docs_b).

    Scale shape (why no doc-pair join): the corpus compacts to
    (gram, split, n_docs) first — one map-side-combined aggregate — and
    the gram-keyed self-join then has <= |splits| rows per gram per
    side, so collision counting never materializes doc pairs."""
    sh = (
        shingle_rows(docs, id_col, text_col, n)
        .distinct()
        .join(
            docs.select(
                F.col(id_col).alias("id"), F.col(split_col).alias("split")
            ),
            "id",
        )
    )
    gs = sh.groupBy("s", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        gs.alias("a")
        .join(
            gs.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.split") < F.col("b.split")),
        )
        .groupBy(
            F.col("a.split").alias("split_a"), F.col("b.split").alias("split_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams_shared"),
            F.sum(F.col("a.n_docs") * F.col("b.n_docs"))
            .cast("long")
            .alias("n_collisions"),
        )
    )
