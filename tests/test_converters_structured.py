"""C2/C3 structured-model converters: cell/run/list/table walks + end-to-end
span -> markdown assembly (the byte decode is the only gated step)."""

from __future__ import annotations

from datetime import datetime

from eget_spark.functions.spans import render_spans
from eget_spark.sources.converters import (
    docx_blocks_to_spans,
    xlsx_sheets_to_spans,
)


def test_xlsx_sheet_walk_padding_and_formats():
    sheets = [
        (
            "S1",
            [
                ["h1", "h2", "h3"],
                [1.0, 2.5, None],  # trailing None stripped -> padded back
                [None, None, None],  # all-None skipped
                [datetime(2024, 1, 2), "x", "y"],
            ],
        ),
        ("Empty", [[None], [None]]),
    ]
    spans = xlsx_sheets_to_spans(sheets)
    assert spans[0] == {
        "kind": "heading", "text": "## Sheet: S1", "media_ref": "", "offset": 0
    }
    assert spans[1]["kind"] == "table"
    rows = [r.split("\t") for r in spans[1]["text"].split("\n")]
    assert rows == [
        ["h1", "h2", "h3"],
        ["1", "2.5", ""],  # integral float -> int str; padded
        ["2024-01-02T00:00:00", "x", "y"],
    ]
    # empty sheet: heading only, no table span
    assert [s["text"] for s in spans if s["kind"] == "heading"] == [
        "## Sheet: S1", "## Sheet: Empty"
    ]
    assert sum(1 for s in spans if s["kind"] == "table") == 1


def test_docx_block_walk_runs_lists_tables():
    blocks = [
        {"type": "heading", "text": "Title", "level": 1},
        {
            "type": "paragraph",
            "runs": [("plain ", False, False, False), ("bold", True, False, False),
                     ("  ", False, False, False), ("both", True, True, False),
                     ("under", False, False, True)],
        },
        {"type": "list", "items": ["a", "b"], "ordered": False},
        {"type": "list", "items": ["x", "y"], "ordered": True},
        {"type": "table", "rows": [["h1", "h2"], ["c1", "c2"]]},
        {"type": "image", "alt": "pic", "ref": "img://ab"},
    ]
    spans = docx_blocks_to_spans(blocks)
    texts = {(s["kind"], s["offset"]): s["text"] for s in spans}
    assert texts[("heading", 0)] == "# Title"
    # bold ** first, italic then wraps the bolded text, underline __
    p = [s for s in spans if s["kind"] == "paragraph"][0]["text"]
    assert p == "plain **bold*****both***__under__"
    assert texts[("list", 2)] == "a\nb"
    assert texts[("list", 3)] == "1. x\n2. y"
    assert texts[("table", 4)] == "h1\th2\nc1\tc2"
    md = render_spans(spans)
    assert md.startswith("# Title")
    assert "1. x" in md and "- a" in md and "| h1 | h2 |" in md
    assert "![pic](img://ab)" in md


def _has(mod: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(mod) is not None


def test_metadata_block_to_span():
    """Core-properties metadata block -> kind=metadata span (renders to ''
    in markdown — document_structure.py metadata branch)."""
    from eget_spark.sources.converters import docx_blocks_to_spans

    blocks = [
        {"type": "metadata", "props": {"title": "T", "author": "A"}},
        {"type": "heading", "text": "H", "level": 1},
    ]
    spans = docx_blocks_to_spans(blocks)
    assert spans[0]["kind"] == "metadata"
    assert '"author": "A"' in spans[0]["text"]
    assert render_spans(spans).strip() == "# H"


def test_decoders_gate_cleanly_when_libs_absent():
    import pytest

    from eget_spark.sources.converters import _decode_docx, _decode_xlsx

    if not _has("docx"):
        with pytest.raises(NotImplementedError):
            _decode_docx(b"PK\x03\x04")
    if not _has("openpyxl"):
        with pytest.raises(NotImplementedError):
            _decode_xlsx(b"PK\x03\x04")


def test_docx_decode_roundtrip():
    """Activates when python-docx is installed (cluster environments):
    byte decode -> block model -> spans, reference walk semantics."""
    import pytest

    if not _has("docx"):
        pytest.skip("python-docx not installed")
    import io

    from docx import Document

    from eget_spark.sources.converters import _decode_docx, docx_blocks_to_spans

    d = Document()
    d.add_heading("Title", level=1)
    p = d.add_paragraph()
    p.add_run("bold").bold = True
    d.add_paragraph("item one", style="List Bullet")
    d.add_paragraph("item two", style="List Bullet")
    t = d.add_table(rows=1, cols=2)
    t.rows[0].cells[0].text = "a"
    t.rows[0].cells[1].text = "b"
    buf = io.BytesIO()
    d.save(buf)
    blocks = _decode_docx(buf.getvalue())
    kinds = [b["type"] for b in blocks]
    assert "heading" in kinds and "paragraph" in kinds and "table" in kinds
    spans = docx_blocks_to_spans(blocks)
    assert any(s["kind"] == "heading" and s["text"] == "# Title" for s in spans)
    assert any(s["kind"] == "paragraph" and s["text"] == "**bold**" for s in spans)
    assert any(s["kind"] == "table" and s["text"] == "a\tb" for s in spans)


def test_xlsx_decode_roundtrip():
    """Activates when openpyxl is installed: first-row content gate,
    trailing-None strip, X20 cell formatting."""
    import pytest

    if not _has("openpyxl"):
        pytest.skip("openpyxl not installed")
    import io

    from openpyxl import Workbook

    from eget_spark.sources.converters import _decode_xlsx, xlsx_sheets_to_spans

    wb = Workbook()
    ws = wb.active
    ws.title = "Data"
    ws.append(["h1", "h2", None])
    ws.append([1.0, "x", None])
    ws2 = wb.create_sheet("EmptyFirstRow")
    ws2.append([None, None])
    ws2.append(["hidden", "data"])
    buf = io.BytesIO()
    wb.save(buf)
    sheets = _decode_xlsx(buf.getvalue())
    # sheet with empty first row skipped (xlsx_converter.py:96-104 quirk)
    assert [s[0] for s in sheets] == ["Data"]
    spans = xlsx_sheets_to_spans(sheets)
    assert spans[0]["text"] == "## Sheet: Data"
    assert spans[1]["text"] == "h1\th2\n1\tx"  # 1.0 -> '1' (X20)
