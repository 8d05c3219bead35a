"""Chunker parity: the faithful kernel reproduces the reference's observable
quirks (SURVEY.md X11/X12, semantic_chunker.py:25-238), and the DataFrame
wrappers agree with the pure kernels."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.functions.text import clean_markdown
from eget_spark.operators.chunker import (
    chunk_semantic,
    semantic_chunks,
    sentence_chunks,
)

MD = """preamble line one
preamble line two

# Title

first paragraph line
second line

```python
x = 1
```

## Sub

- item one
- item two
"""


def test_faithful_header_drop_and_preamble():
    chunks = semantic_chunks(MD)
    contents = [c["content"] for c in chunks]
    # preamble flushed when '# Title' arrives (current empty, no chunks yet)
    assert contents[0] == "preamble line one\npreamble line two"
    # header lines themselves are dropped (truncated reference code)
    assert not any(c.startswith("#") for c in contents)
    # code-fence close flushes the whole accumulated buffer as one `code`
    # chunk — INCLUDING the paragraph lines before the fence (reference
    # appends the fence to current_content, semantic_chunker.py:51-71)
    code = [c for c in chunks if c["type"] == "code"]
    assert len(code) == 1 and code[0]["code_language"] == "python"
    assert code[0]["content"] == (
        "first paragraph line\nsecond line\n\n```python\nx = 1\n```"
    )
    # no header metadata ever recorded
    assert all(c["path"] == [] and c["level"] == 0 and c["heading"] is None for c in chunks)
    # positions are 0..n-1
    assert [c["position"] for c in chunks] == list(range(len(chunks)))


def test_faithful_no_header_loses_preamble():
    # reference quirk: a document with no headers produces ZERO chunks
    assert semantic_chunks("just text\nmore text\n") == []


def test_track_headers_extension():
    chunks = semantic_chunks(MD, track_headers=True)
    sub = [c for c in chunks if c["heading"] == "Sub"]
    assert sub and sub[0]["path"] == ["Title", "Sub"] and sub[0]["level"] == 2
    assert sub[0]["type"] == "list" and sub[0]["has_lists"]


def test_clean_markdown_destroys_newlines(spark):
    """X11 quirk: \\s+ -> ' ' first (Python \\s eats \\xa0 runs too), so the
    output is one line."""
    df = spark.createDataFrame(
        [("# a\n\nb &nbsp; c\xa0\xa0d <!-- zap -->e",)], "md string"
    )
    got = df.select(clean_markdown(F.col("md")).alias("c")).collect()[0]["c"]
    assert "\n" not in got
    assert got == "# a b   c d e"


def test_chunk_semantic_wrapper_matches_kernel(spark):
    rows = [("d1", MD), ("d2", "no headers here\n"), ("d3", "# only header\n")]
    df = spark.createDataFrame(rows, "doc_id string, markdown string")
    got = chunk_semantic(df).orderBy("doc_id", "position").collect()
    want = []
    for doc_id, md in rows:
        for c in semantic_chunks(md):
            want.append((doc_id, c["position"], c["content"], c["type"]))
    assert [(r["doc_id"], r["position"], r["content"], r["type"]) for r in got] == want


def test_sentence_chunks_properties():
    text = ". ".join(f"sentence number {i} with several extra words" for i in range(200)) + "."
    chunks = sentence_chunks(text, chunk_size=50, chunk_overlap=10)
    assert all(c["word_count"] <= 50 + 7 for c in chunks)  # one sentence may overflow
    assert [c["position"] for c in chunks] == list(range(len(chunks)))
    # every sentence index appears in at least one chunk (coverage)
    joined = " ".join(c["content"] for c in chunks)
    for i in range(200):
        assert f"sentence number {i} " in joined or f"sentence number {i}." in joined
    # overlap: each chunk starts with the previous chunk's final sentence
    for i in range(len(chunks) - 1):
        last_sentence = chunks[i]["content"].rsplit(". ", 1)[-1]
        assert chunks[i + 1]["content"].startswith(last_sentence)


def test_sentence_chunks_single_short_text():
    assert sentence_chunks("tiny") == [
        {"content": "tiny", "position": 0, "word_count": 1, "sentence_count": 1}
    ]
    assert sentence_chunks("   ") == []


# --- X14 Chonkie-config parity goldens (chunk_service.py:95-105) -------------


def test_sentence_min_characters_merge_forward():
    from eget_spark.operators.chunker import sentence_chunks

    # "Hi." (3 chars < 12) merges into the next sentence
    out = sentence_chunks("Hi. This is a longer sentence here.", chunk_size=512)
    assert len(out) == 1
    assert out[0]["content"] == "Hi. This is a longer sentence here."
    assert out[0]["sentence_count"] == 1  # merged into ONE sentence unit


def test_sentence_min_sentences_per_chunk_overrides_size():
    from eget_spark.operators.chunker import sentence_chunks

    # a single sentence longer than chunk_size still forms a chunk
    big = " ".join(f"w{i}" for i in range(30)) + "."
    out = sentence_chunks(big, chunk_size=10, chunk_overlap=0)
    assert len(out) == 1 and out[0]["word_count"] == 30
    # min_sentences_per_chunk=2 packs two sentences even over chunk_size
    two = "alpha beta gamma delta. epsilon zeta eta theta."
    out2 = sentence_chunks(
        two, chunk_size=4, chunk_overlap=0, min_sentences_per_chunk=2
    )
    assert len(out2) == 1 and out2[0]["sentence_count"] == 2


def test_sentence_overlap_token_accounting():
    from eget_spark.operators.chunker import sentence_chunks

    # 6 sentences x 5 tokens; size 10 -> 2 sentences per chunk;
    # overlap 5 -> back off exactly ONE whole 5-token sentence
    text = " ".join(
        f"s{i} alpha beta gamma delta." for i in range(6)
    )
    out = sentence_chunks(text, chunk_size=10, chunk_overlap=5)
    assert [c["sentence_count"] for c in out] == [2, 2, 2, 2, 2]
    # consecutive chunks share exactly one sentence
    for a, b in zip(out, out[1:]):
        last_a = a["content"].split(".")[-2].strip()
        first_b = b["content"].split(".")[0].strip()
        assert last_a == first_b
    # overlap smaller than any sentence -> disjoint chunks
    out0 = sentence_chunks(text, chunk_size=10, chunk_overlap=4)
    assert [c["sentence_count"] for c in out0] == [2, 2, 2]
    # positions enumerate 0..n-1
    assert [c["position"] for c in out] == list(range(5))


def test_sentence_reference_config_defaults():
    from eget_spark.operators.chunker import sentence_chunks

    # the exact ChunkService config: 512/50/1/12 over a long doc
    text = " ".join(f"tok{i} tok tok tok tok tok tok tok tok." for i in range(200))
    out = sentence_chunks(text)  # defaults = reference config
    assert all(c["word_count"] <= 512 for c in out)
    # overlap tokens between consecutive chunks is <= 50
    for a, b in zip(out, out[1:]):
        a_s = set(a["content"].split("."))
        b_s = set(b["content"].split("."))
        shared = [s for s in a_s & b_s if s.strip()]
        assert sum(len(s.split()) for s in shared) <= 50


def test_sentence_chonkie_estimate_counter():
    """X14 (round-3 verdict item #9): the transcribed Chonkie
    approximate=True accounting — max(1, len(sentence) // 6) — drives
    packing when token_counter="chonkie-estimate"; word_count metadata
    stays whitespace-based either way."""
    from eget_spark.operators.chunker import (
        _chonkie_token_estimate,
        sentence_chunks,
    )

    assert _chonkie_token_estimate("") == 1  # floor at one token
    assert _chonkie_token_estimate("abcdef") == 1
    assert _chonkie_token_estimate("a" * 13) == 2

    # two 30-char sentences: estimate 5 tokens each; chunk_size=10 packs
    # both; chunk_size=9 splits — under whitespace counting (6 words each)
    # the same sizes behave differently (12 > 10 splits)
    s = "alpha beta gamma delta ee ff."  # 29 chars + space handling
    text = f"{s} {s}"
    est = sentence_chunks(text, chunk_size=10, chunk_overlap=0,
                          token_counter="chonkie-estimate")
    ws = sentence_chunks(text, chunk_size=10, chunk_overlap=0)
    assert len(est) == 1 and len(ws) == 2
    assert est[0]["word_count"] == 12  # metadata stays whitespace words

    # overlap backoff uses the same estimate accounting
    many = " ".join(f"s{i} aaaa bbbb cccc dddd." for i in range(8))
    out = sentence_chunks(many, chunk_size=8, chunk_overlap=4,
                          token_counter="chonkie-estimate")
    for a, b in zip(out, out[1:]):
        last_a = a["content"].split(".")[-2].strip()
        assert b["content"].startswith(last_a)
