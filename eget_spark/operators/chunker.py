"""Markdown chunking operators (X11-X14, O4).

`semantic_chunks` is a faithful reimplementation of the reference's
SemanticChunker (/root/reference/services/chunker/semantic_chunker.py:25-238)
including its observable quirks, which parity REQUIRES (SURVEY.md §7.4):

- the shipped header-handling body is truncated (semantic_chunker.py:100 is
  literally ``# Rest of the header handling code...``): header lines flush
  accumulated content but are themselves DROPPED, and Header metadata is
  never recorded — so ``path`` is always [], ``level`` 0, ``heading`` None
- the preamble is flushed only when the first header arrives while no other
  content/chunks exist (:88-96); if the document never has a header, the
  preamble is silently lost
- pre-first-header lines *containing* ``"# "`` anywhere bypass the preamble
  (substring test, :46) and accumulate as regular content
- blank lines never flush a chunk (the elif at :104-111 is unreachable)
- code fences always isolate a `code` chunk with the fence language (:51-71)

`track_headers=True` is the engine's extension implementing the evident
intent (header stack -> Header 1..6 metadata, path/heading/level) for users
who want real hierarchy; tests pin the faithful mode.

`sentence_chunks` reimplements the Chonkie SentenceChunker configuration
used by the reference (chunk_service.py:20-24: chunk_size=512 tokens,
chunk_overlap=50, min_characters_per_sentence=12) as a sliding-window
sentence packer (whitespace tokens; Chonkie itself is not a dependency).

Both kernels are sequential per document but parallel across documents —
exposed as `mapInPandas` flat-maps (no shuffle: chunking never moves data,
position numbering is per-doc, O4's window is unnecessary in-kernel).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADER_SEPS = ["#", "##", "###", "####", "#####", "######"]

CHUNK_SCHEMA_DDL = (
    "doc_id string, position int, content string, type string, level int, "
    "path array<string>, heading string, code_language string, "
    "word_count int, line_count int, content_preview string, "
    "has_code boolean, has_lists boolean, has_links boolean, "
    "estimated_read_time int, needs_merge boolean, needs_split boolean"
)


def _create_chunk(
    content: str,
    metadata: dict,
    chunk_type: str = "text",
    code_language: str | None = None,
    max_chunk_size: int = 1500,
    min_chunk_size: int = 200,
) -> dict | None:
    """Mirrors _create_chunk (semantic_chunker.py:133-238)."""
    if not content:
        return None
    content = "\n".join(line.rstrip() for line in content.splitlines()).strip()
    if not content:
        return None
    lines = content.splitlines()
    word_count = len(content.split())
    is_header_chunk = any(k.startswith("Header") for k in metadata)
    is_code_chunk = chunk_type == "code"
    is_preamble = metadata.get("type") == "preamble"
    needs_merge = needs_split = False
    if not (is_header_chunk or is_code_chunk or is_preamble):
        if word_count < min_chunk_size:
            needs_merge = True
        elif word_count > max_chunk_size:
            needs_split = True
    path = [metadata[f"Header {i}"] for i in range(1, 7) if f"Header {i}" in metadata]
    if chunk_type == "text":
        if content.startswith("#"):
            chunk_type = "header"
        elif content.startswith("```"):
            chunk_type = "code"
        elif content.startswith(("- ", "* ", "1. ")):
            chunk_type = "list"
        elif "|" in content and "-|-" in content:
            chunk_type = "table"
    heading = metadata.get(f"Header {len(path)}") if path else None
    return {
        "content": content,
        "type": chunk_type,
        "level": len(path),
        "path": path,
        "heading": heading,
        "code_language": code_language if is_code_chunk else None,
        "word_count": word_count,
        "line_count": len(lines),
        "content_preview": content[:100] + "..." if len(content) > 100 else content,
        "has_code": "```" in content or "`" in content,
        "has_lists": bool(re.search(r"^\s*[-*]\s", content, re.MULTILINE)),
        "has_links": "[" in content and "](" in content,
        "estimated_read_time": max(1, word_count // 200),
        "needs_merge": needs_merge,
        "needs_split": needs_split,
    }


def semantic_chunks(
    text: str,
    max_chunk_size: int = 1500,
    min_chunk_size: int = 200,
    track_headers: bool = False,
) -> list[dict]:
    """Line-walker; faithful to chunk_markdown (semantic_chunker.py:25-131)."""
    chunks: list[dict] = []
    current: list[str] = []
    metadata: dict = {}
    preamble: list[str] = []
    found_first_header = False
    in_code = False
    code_language: str | None = None

    def mk(content_lines, meta, ctype="text", lang=None):
        return _create_chunk(
            "\n".join(content_lines), meta, ctype, lang, max_chunk_size, min_chunk_size
        )

    for line in text.split("\n"):
        stripped = line.strip()
        if not found_first_header and not any(
            sep + " " in stripped for sep in _HEADER_SEPS
        ):
            preamble.append(line)
            continue
        if not in_code and stripped.startswith("```"):
            in_code = True
            code_language = stripped[3:].strip()
            current.append(line)
            continue
        elif in_code:
            current.append(line)
            if stripped.startswith("```"):
                in_code = False
                if current:
                    c = mk(current, metadata.copy(), "code", code_language)
                    if c:
                        chunks.append(c)
                    current = []
            continue
        header_match = False
        for si, sep in enumerate(_HEADER_SEPS, start=1):
            if stripped.startswith(sep + " "):
                found_first_header = True
                header_match = True
                if current:
                    c = mk(current, metadata.copy())
                    if c:
                        chunks.append(c)
                    current = []
                elif preamble and not chunks:
                    c = mk(preamble, {"type": "preamble"})
                    if c:
                        chunks.append(c)
                    preamble = []
                if track_headers:
                    # engine extension: what the truncated reference code
                    # evidently intended — maintain the header stack
                    for j in range(si, 7):
                        metadata.pop(f"Header {j}", None)
                    metadata[f"Header {si}"] = stripped[si + 1 :].strip()
        if not header_match and not in_code:
            if line.strip() or current:
                current.append(line)
    if current:
        c = mk(current, metadata.copy())
        if c:
            chunks.append(c)
    for i, c in enumerate(chunks):
        c["position"] = i
    return chunks


_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def _chonkie_token_estimate(s: str) -> int:
    """Chonkie's ``approximate=True`` token accounting, transcribed
    (sentence chunker ``_estimate_token_counts``): ``max(1, len(text) //
    6)`` — the CHARS_PER_TOKEN~6 heuristic the library packs with when
    exact tokenization is not requested.  The library's follow-up
    exact-count feedback pass requires the real GPT-2 BPE vocab
    (tokenizers/tiktoken, absent here) and remains the one documented
    residual; this closes the estimate arithmetic itself."""
    return max(1, len(s) // 6)


def sentence_chunks(
    text: str,
    chunk_size: int = 512,
    chunk_overlap: int = 50,
    min_characters_per_sentence: int = 12,
    min_sentences_per_chunk: int = 1,
    token_counter: str = "whitespace",
) -> list[dict]:
    """Sliding sentence packer (ChunkService's Chonkie config,
    chunk_service.py:95-105: chunk_size=512, chunk_overlap=50,
    min_sentences_per_chunk=1, min_characters_per_sentence=12).

    ``token_counter`` selects the packing arithmetic:
    - ``"whitespace"`` (default, golden/oracle-pinned): tokens are
      whitespace words;
    - ``"chonkie-estimate"``: Chonkie's own ``approximate=True`` rule —
      ``max(1, len(sentence) // 6)`` per sentence — transcribed from the
      library source (round-3 verdict item #9), so the packing totals
      match what the reference's chunker computes before its (BPE-vocab-
      dependent, unreproducible here) exact-count feedback pass.

    Packing rules (shared by both counters, pinned by goldens):

    - sentences shorter than min_characters_per_sentence merge forward
      into the next sentence;
    - each chunk takes at least min_sentences_per_chunk sentences, then
      greedily packs while the token total stays <= chunk_size;
    - the next chunk starts back by whole sentences whose token total is
      <= chunk_overlap (never consuming the whole chunk: progress is
      guaranteed past the first packed sentence)."""
    if not text or not text.strip():
        return []
    raw = [s for s in _SENT_RE.split(text) if s.strip()]
    # merge too-short sentences forward (Chonkie's min_characters rule)
    sents: list[str] = []
    for s in raw:
        if sents and len(sents[-1]) < min_characters_per_sentence:
            sents[-1] = f"{sents[-1]} {s}"
        else:
            sents.append(s)
    if token_counter == "chonkie-estimate":
        counts = [_chonkie_token_estimate(s) for s in sents]
    else:
        counts = [len(s.split()) for s in sents]
    chunks = []
    i = 0
    pos = 0
    n = len(sents)
    while i < n:
        j = i
        total = 0
        while j < n and (
            j - i < min_sentences_per_chunk or total + counts[j] <= chunk_size
        ):
            total += counts[j]
            j += 1
        content = " ".join(sents[i:j])
        chunks.append(
            {
                "content": content,
                "position": pos,
                "word_count": len(content.split()),
                "sentence_count": j - i,
            }
        )
        pos += 1
        if j >= n:
            break
        # back off whole sentences totalling <= chunk_overlap tokens
        back = 0
        k = j
        while k - 1 > i and back + counts[k - 1] <= chunk_overlap:
            k -= 1
            back += counts[k]
        i = k
    return chunks


SENTENCE_SCHEMA_DDL = (
    "doc_id string, position int, content string, word_count int, sentence_count int"
)


def _widen(src: DataFrame) -> DataFrame:
    """Width guard for the chunker flat-maps (round 6, guide §2.5/§6):
    chunking is compute-heavy per row, and a compact parquet source
    scans as 1-2 splits, serializing the whole corpus through 1-2
    Python workers (measured: the q22 chunk stage ran 2 of 32 slots at
    sf1-scale).  When the scan is NARROWER than the cluster, one narrow
    exchange of the raw (id, text) rows buys full-width chunking; at
    scale the scan already has >= cluster-width splits and the operator
    stays shuffle-free, preserving the no-shuffle contract above."""
    par = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        return src.repartition(par)
    return src


def chunk_semantic(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "markdown",
    track_headers: bool = False,
    max_chunk_size: int = 1500,
    min_chunk_size: int = 200,
) -> DataFrame:
    """X12/X13: flat-map docs -> chunk rows. No shuffle; Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for c in semantic_chunks(
                    text, max_chunk_size, min_chunk_size, track_headers
                ):
                    c["doc_id"] = doc_id
                    out.append(c)
            if out:
                yield pd.DataFrame(out)

    return _widen(
        df.select(F.col(id_col).alias(id_col), F.col(text_col))
    ).mapInPandas(run, schema=CHUNK_SCHEMA_DDL)


def chunk_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "markdown",
    chunk_size: int = 512,
    chunk_overlap: int = 50,
    token_counter: str = "whitespace",
) -> DataFrame:
    """X14: sentence chunker flat-map.  ``token_counter="chonkie-
    estimate"`` packs with the transcribed Chonkie approximate rule."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for c in sentence_chunks(
                    text, chunk_size, chunk_overlap, token_counter=token_counter
                ):
                    c["doc_id"] = doc_id
                    out.append(c)
            if out:
                yield pd.DataFrame(out)

    return _widen(
        df.select(F.col(id_col).alias(id_col), F.col(text_col))
    ).mapInPandas(run, schema=SENTENCE_SCHEMA_DDL)


def token_windows(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    window: int = 128,
    stride: int = 96,
) -> "DataFrame":
    """Fixed-size token windows with stride — the LM-pretraining context
    windower (stride < window = overlapping contexts, the standard way
    long documents become training rows without losing cross-boundary
    text).  Third chunker next to the semantic (X12) and sentence (X14)
    chunkers; unlike those, the window boundary is purely positional, so
    the whole op is JVM array algebra: tokenize (the engine's
    whitespace-token contract, same as the shingle/minhash path), one
    ``posexplode`` of the window-index sequence, ``slice`` per window —
    zero Python, no window function, one generator stage.

    Pinned semantics: ``n_windows = 1 + max(0, ceil((n_tokens - window)
    / stride))`` (every doc yields at least one window; the last window
    may be short; whitespace-only text follows the tokenizer's [''] one-
    token artifact — identical in DuckDB).  Output (id, win_idx,
    n_win_tokens, win_text).
    """
    w, s = int(window), int(stride)
    if w <= 0 or s <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_win = F.lit(1) + F.greatest(
        F.lit(0), F.expr(f"(size(_toks) - {w} + {s} - 1) div {s}").cast("int")
    )
    base = df.select(
        F.col(id_col).cast("long").alias("id"), toks.alias("_toks")
    )
    out = base.select(
        "id",
        "_toks",
        F.posexplode(F.sequence(F.lit(0), n_win - 1)).alias(
            "win_idx", "_w"
        ),
    ).select(
        "id",
        F.col("win_idx").cast("long").alias("win_idx"),
        F.slice(F.col("_toks"), F.col("_w") * s + 1, w).alias("_win"),
    )
    return out.select(
        "id",
        "win_idx",
        F.size("_win").cast("long").alias("n_win_tokens"),
        F.array_join("_win", " ").alias("win_text"),
    )
