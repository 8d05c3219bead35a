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
