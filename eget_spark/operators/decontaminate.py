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
