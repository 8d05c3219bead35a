"""Property-based tests (SURVEY.md §5.5) over the pure kernels."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from eget_spark.functions.spans import render_spans
from eget_spark.operators.chunker import semantic_chunks, sentence_chunks
from tests.oracle import oracle_markdown

_kind = st.sampled_from(
    ["heading", "paragraph", "list", "table", "code", "math", "image", "separator", "link", "metadata"]
)
_text = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "P", "Z"), max_codepoint=0x2000),
    max_size=40,
)


@st.composite
def span_seqs(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    spans = []
    for i in range(n):
        kind = draw(_kind)
        text = draw(_text)
        if kind == "heading":
            level = draw(st.integers(1, 6))
            text = "#" * level + " " + text.replace("\n", " ")
        spans.append(
            {"kind": kind, "text": text, "media_ref": f"r{i}", "offset": i}
        )
    return spans


@given(span_seqs())
@settings(max_examples=200, deadline=None)
def test_flat_render_equals_tree_render(spans):
    """Engine flat pass == oracle tree render for arbitrary sequences."""
    assert render_spans(spans) == oracle_markdown(spans)


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_semantic_chunks_never_crash_and_positions(text):
    chunks = semantic_chunks(text)
    assert [c["position"] for c in chunks] == list(range(len(chunks)))
    for c in chunks:
        assert c["content"].strip() == c["content"]
        assert c["word_count"] == len(c["content"].split())


@given(st.text(alphabet="ab .!?\n", max_size=400), st.integers(5, 64))
@settings(max_examples=200, deadline=None)
def test_sentence_chunks_coverage(text, size):
    chunks = sentence_chunks(text, chunk_size=size, chunk_overlap=size // 4)
    # no content loss: all non-whitespace chars preserved across chunks
    if text.strip():
        assert chunks
        got = "".join(re.sub(r"\s", "", c["content"]) for c in chunks)
        want = re.sub(r"\s", "", text)
        # overlap duplicates sentences, so got is a superset sequence
        for ch in set(want):
            assert got.count(ch) >= want.count(ch)
    else:
        assert chunks == []
