"""C1-C3 converter heuristics (pure text-layer computation; binary decode is
import-gated — SURVEY.md §2.9 / FIXTURES.md §6)."""

from __future__ import annotations

import pytest

from eget_spark.sources.converters import (
    format_cell,
    heading_level,
    is_heading,
    is_list_item,
    parse_table_text,
    pdf_date_to_iso,
    pdf_text_to_spans,
)


def test_is_heading_rules():
    assert is_heading("1. Introduction")
    assert is_heading("Chapter 3")
    assert is_heading("ALL CAPS TITLE")
    assert is_heading("2.1 Background")
    assert not is_heading("This is a sentence.")
    assert not is_heading("Ends with question?")
    assert not is_heading("x" * 101)
    assert not is_heading("lowercase start text")


def test_heading_levels():
    assert heading_level("Chapter 1") == 1
    assert heading_level("Section 2") == 2
    assert heading_level("2.1 Background") == 3
    assert heading_level("3) Item") == 3
    assert heading_level("ALL CAPS") == 2
    assert heading_level("plain") == 3


def test_is_list_item():
    for t in ["- a", "* b", "• c", "1. d", "2) e", "a. f", "[x] g", "– h"]:
        assert is_list_item(t), t
    assert not is_list_item("plain text")
    assert not is_list_item("")


def test_parse_table_text_pipes_and_spaces():
    # NOTE reference quirk (pdf_converter.py:261): the skip regex only
    # matches +---+ grid lines; a markdown |---|---| row is NOT skipped
    # (the '|' inside isn't in [-+]) and parses as a data row
    assert parse_table_text("|a|b|\n|---|---|\n|1|2|") == [
        ["a", "b"],
        ["---", "---"],
        ["1", "2"],
    ]
    assert parse_table_text("colA  colB\nv1    v2") == [["colA", "colB"], ["v1", "v2"]]
    # +---+ separator lines skipped
    assert parse_table_text("+---+---+\n|a|b|\n+---+---+") == [["a", "b"]]


def test_pdf_date():
    assert pdf_date_to_iso("D:20240131120000+05'00'") == "2024-01-31T12:00:00"
    assert pdf_date_to_iso("garbage") is None


def test_format_cell():
    from datetime import datetime

    assert format_cell(None) == ""
    assert format_cell(5.0) == "5"
    assert format_cell(5.5) == "5.5"
    assert format_cell(datetime(2024, 1, 2, 3, 4, 5)) == "2024-01-02T03:04:05"
    assert format_cell("x") == "x"


def test_pdf_text_to_spans_walk():
    page = (
        "Chapter 1\n"
        "This is the opening paragraph of the document\n"
        "continuing on a second line.\n"
        "\n"
        "- first item\n"
        "- second item\n"
    )
    spans = pdf_text_to_spans("doc.pdf", [page])
    kinds = [s["kind"] for s in spans]
    assert kinds[0] == "heading" and spans[0]["text"] == "## Page 1"
    assert "heading" in kinds[1:]  # Chapter 1
    ch = [s for s in spans if s["text"].endswith("Chapter 1")][0]
    assert ch["text"].startswith("# ")  # level 1
    para = [s for s in spans if s["kind"] == "paragraph"]
    assert para and para[0]["text"].startswith("This is the opening")
    lst = [s for s in spans if s["kind"] == "list"]
    assert lst and lst[0]["text"] == "first item\nsecond item"
    offsets = [s["offset"] for s in spans]
    assert offsets == list(range(len(spans)))


def test_binary_decode_gated(spark, tmp_path):
    from eget_spark.sources.converters import convert_files

    p = tmp_path / "f.docx"
    p.write_bytes(b"fake")
    files = spark.read.format("binaryFile").load(str(p))
    with pytest.raises(Exception) as e:
        convert_files(files).collect()
    assert "NotImplementedError" in str(e.value) or "python-docx" in str(e.value)


def test_convert_files_txt_and_content_dedup(spark, tmp_path):
    """S5 end-to-end without gated libs (txt routes through the text-layer
    pipeline) + the conversion-cache analogue: identical bytes decode once
    and fan back to every path; dedupe on/off give identical output."""
    from eget_spark.sources.converters import convert_files

    body = "Chapter 1\nSome opening text here.\n- alpha\n- beta\n"
    (tmp_path / "a.txt").write_text(body)
    (tmp_path / "b.txt").write_text(body)  # duplicate bytes
    (tmp_path / "c.txt").write_text("Other doc.\n")
    files = spark.read.format("binaryFile").load(str(tmp_path / "*.txt"))

    out = {r["doc_id"]: r for r in convert_files(files).collect()}
    assert len(out) == 3
    a = sorted(
        [s.asDict() for s in next(v for k, v in out.items() if k.endswith("a.txt"))["spans"]],
        key=lambda s: s["offset"],
    )
    kinds = [s["kind"] for s in a]
    assert kinds[0] == "heading"  # '## Page 1'
    assert "list" in kinds and "paragraph" in kinds
    b = sorted(
        [s.asDict() for s in next(v for k, v in out.items() if k.endswith("b.txt"))["spans"]],
        key=lambda s: s["offset"],
    )
    assert a == b  # identical bytes -> identical spans via the shared key

    no_dedup = {
        r["doc_id"]: sorted([s.asDict() for s in r["spans"]], key=lambda s: s["offset"])
        for r in convert_files(files, dedupe_content=False).collect()
    }
    assert {k: sorted([s.asDict() for s in v["spans"]], key=lambda s: s["offset"]) for k, v in out.items()} == no_dedup
