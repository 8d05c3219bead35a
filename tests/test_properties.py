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


@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([1, 3, 4]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, channels, seed):
    """Stdlib PNG codec: encode->decode is identity for arbitrary small
    images across gray/RGB/RGBA."""
    import numpy as np

    from eget_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(arr))
    assert back.shape == arr.shape and (back == arr).all()


_XL_CELL = st.one_of(
    st.none(),
    st.integers(-10**9, 10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.text(max_size=20),
)


@given(st.lists(st.lists(_XL_CELL, max_size=5), min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_xlsx_roundtrip_property(rows):
    """build_xlsx_bytes -> decode_xlsx_bytes reproduces the value grid
    (modulo openpyxl-parity typing: whole floats -> int, trailing-None
    row widths)."""
    from eget_spark.sources.ooxml import build_xlsx_bytes, decode_xlsx_bytes

    sheets = decode_xlsx_bytes(build_xlsx_bytes([("P", rows)]))
    if not any(c is not None for c in (rows[0] or [None])):
        assert sheets == []  # first-row content gate
        return
    got = sheets[0][1]
    assert len(got) == len(rows)
    for want_row, got_row in zip(rows, got):
        # compare cell-by-cell over the written width (trailing Nones are
        # not materialized by the writer)
        for i, want in enumerate(want_row):
            got_cell = got_row[i] if i < len(got_row) else None
            if want is None:
                assert got_cell is None
            elif isinstance(want, bool):
                assert got_cell is want
            elif isinstance(want, float) and float(want).is_integer() and abs(want) < 1e15:
                assert got_cell == int(want)
            elif isinstance(want, (int, float)):
                assert got_cell == want
            else:
                assert got_cell == want


@given(st.lists(st.text(max_size=30), min_size=1, max_size=6), st.integers(1, 3))
@settings(max_examples=60, deadline=None)
def test_docx_paragraph_roundtrip_property(texts, level):
    """build_docx_bytes -> decode -> shared walk preserves paragraph text
    and heading levels for arbitrary content."""
    from eget_spark.sources.converters import docx_events_to_blocks
    from eget_spark.sources.ooxml import build_docx_bytes, decode_docx_bytes

    blocks = [{"type": "heading", "text": "T", "level": level}] + [
        {"type": "paragraph", "runs": [(t, False, False, False)]} for t in texts
    ]
    out = docx_events_to_blocks(*decode_docx_bytes(build_docx_bytes(blocks)))
    assert out[0] == {"type": "heading", "text": "T", "level": level}
    want = [t for t in texts if t.strip()]  # empty paragraphs are skipped
    got = ["".join(r[0] for r in b["runs"]) for b in out[1:]]
    assert got == want
