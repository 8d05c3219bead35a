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


def test_decoders_reject_garbage_bytes():
    """Non-zip bytes fail loudly (BadZipFile or the library's error),
    never a silent empty result — with or without the optional libs."""
    import pytest

    from eget_spark.sources.converters import _decode_docx, _decode_xlsx

    with pytest.raises(Exception):
        _decode_docx(b"PK\x03\x04not a real archive")
    with pytest.raises(Exception):
        _decode_xlsx(b"PK\x03\x04not a real archive")


def _docx_test_bytes() -> bytes:
    """Synthesize the roundtrip fixture: python-docx when installed
    (cluster parity), the stdlib ooxml writer otherwise — either way the
    decode under test runs unconditionally."""
    if _has("docx"):
        import io

        from docx import Document

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
        return buf.getvalue()
    from eget_spark.sources.ooxml import build_docx_bytes

    return build_docx_bytes(
        [
            {"type": "heading", "text": "Title", "level": 1},
            {"type": "paragraph", "runs": [("bold", True, False, False)]},
            {"type": "list", "items": ["item one", "item two"]},
            {"type": "table", "rows": [["a", "b"]]},
        ]
    )


def test_docx_decode_roundtrip():
    """Byte decode -> block model -> spans, reference walk semantics —
    runs in every environment (stdlib zipfile+ElementTree fallback)."""
    from eget_spark.sources.converters import _decode_docx, docx_blocks_to_spans

    blocks = _decode_docx(_docx_test_bytes())
    kinds = [b["type"] for b in blocks]
    assert "heading" in kinds and "paragraph" in kinds and "table" in kinds
    spans = docx_blocks_to_spans(blocks)
    assert any(s["kind"] == "heading" and s["text"] == "# Title" for s in spans)
    assert any(s["kind"] == "paragraph" and s["text"] == "**bold**" for s in spans)
    assert any(s["kind"] == "table" and s["text"] == "a\tb" for s in spans)


def test_docx_stdlib_decode_walk_quirks():
    """The stdlib path must reproduce the reference walk quirks exactly:
    same-level pop keeps only the LAST item of a numId run; an open list
    is closed by the next plain paragraph (AFTER an intervening table);
    a list open at end-of-document is dropped."""
    from eget_spark.sources.converters import (
        docx_blocks_to_spans,
        docx_events_to_blocks,
    )
    from eget_spark.sources.ooxml import build_docx_bytes, decode_docx_bytes

    data = build_docx_bytes(
        [
            {"type": "heading", "text": "H", "level": 2},
            {"type": "list", "items": ["one", "two"]},
            {"type": "table", "rows": [["x"]]},
            {"type": "paragraph", "runs": [("closer", False, False, False)]},
            {"type": "list", "items": ["never flushed"]},
        ],
        props={"title": "T", "author": "Au"},
    )
    blocks = docx_events_to_blocks(*decode_docx_bytes(data))
    assert blocks[0]["type"] == "metadata" and blocks[0]["props"]["author"] == "Au"
    assert [b["type"] for b in blocks[1:]] == ["heading", "table", "list", "paragraph"]
    # pop-at-same-level quirk: only the last item of the run survives
    assert blocks[3]["items"] == ["two"]
    # trailing open list dropped (no close at end-of-document)
    assert all("never flushed" not in str(b) for b in blocks)
    spans = docx_blocks_to_spans(blocks)
    assert spans[1]["text"] == "## H"


def _xlsx_test_bytes() -> bytes:
    if _has("openpyxl"):
        import io

        from openpyxl import Workbook

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
        return buf.getvalue()
    from eget_spark.sources.ooxml import build_xlsx_bytes

    return build_xlsx_bytes(
        [
            ("Data", [["h1", "h2", None], [1.0, "x", None]]),
            ("EmptyFirstRow", [[None, None], ["hidden", "data"]]),
        ]
    )


def test_xlsx_decode_roundtrip():
    """First-row content gate, trailing-None strip, X20 cell formatting —
    runs in every environment (stdlib fallback)."""
    from eget_spark.sources.converters import _decode_xlsx, xlsx_sheets_to_spans

    sheets = _decode_xlsx(_xlsx_test_bytes())
    # sheet with empty first row skipped (xlsx_converter.py:96-104 quirk)
    assert [s[0] for s in sheets] == ["Data"]
    spans = xlsx_sheets_to_spans(sheets)
    assert spans[0]["text"] == "## Sheet: Data"
    assert spans[1]["text"] == "h1\th2\n1\tx"  # 1.0 -> '1' (X20)


def test_xlsx_stdlib_types_dates_and_gaps():
    """Stdlib cell typing: shared/inline strings, bools, date-styled
    serials -> datetime (X20 renders isoformat), column gaps -> None."""
    from datetime import datetime

    from eget_spark.sources.converters import xlsx_sheets_to_spans
    from eget_spark.sources.ooxml import build_xlsx_bytes, decode_xlsx_bytes

    rows = [
        ["name", "when", "n", "ok"],
        ["a", datetime(2024, 3, 1, 12, 30), 2.5, True],
        ["gap", None, 7, False],
    ]
    sheets = decode_xlsx_bytes(build_xlsx_bytes([("S", rows)]))
    assert sheets[0][0] == "S"
    got = sheets[0][1]
    assert got[1][1] == datetime(2024, 3, 1, 12, 30)
    assert got[1][2] == 2.5 and got[1][3] is True
    assert got[2][1] is None and got[2][2] == 7
    spans = xlsx_sheets_to_spans(sheets)
    assert "2024-03-01T12:30:00" in spans[1]["text"]


def test_docx_merged_cells_match_python_docx_row_cells():
    """C2 delta closed (round-3 verdict item #6): python-docx ``row.cells``
    repeats a horizontally merged cell per grid column (gridSpan) and a
    vertical-merge continuation cell carries the text of the cell above —
    the stdlib decode now matches (docx_converter.py:319-339)."""
    from eget_spark.sources.ooxml import build_docx_bytes, decode_docx_bytes

    data = build_docx_bytes(
        [
            {
                "type": "table",
                "rows": [
                    [("Merged AB", 2), "C"],
                    ["a", "b", "c"],
                    [("Tall", 1, "restart"), "x", "y"],
                    [("", 1, "continue"), "p", "q"],
                ],
            }
        ]
    )
    _, events = decode_docx_bytes(data)
    (kind, rows), = [e for e in events if e[0] == "tbl"]
    assert rows == [
        ["Merged AB", "Merged AB", "C"],  # gridSpan=2 repeats per column
        ["a", "b", "c"],
        ["Tall", "x", "y"],
        ["Tall", "p", "q"],  # vMerge continue carries the cell above
    ]


def test_pdf_decode_roundtrip():
    """C1 end-to-end without PyPDF2: build a Flate PDF, extract the text
    layer with the stdlib parser, classify through pdf_text_to_spans."""
    from eget_spark.sources.converters import _decode_pdf, pdf_text_to_spans
    from eget_spark.sources.pdfmini import build_pdf_bytes

    pages = [
        "Chapter 1\nOpening paragraph text here.\n- alpha\n- beta",
        "SECTION TWO\nSecond page (with parens) and a \\ backslash.",
    ]
    data = build_pdf_bytes(pages)
    assert _decode_pdf(data) == pages
    # uncompressed streams decode identically
    assert _decode_pdf(build_pdf_bytes(pages, compress=False)) == pages
    spans = pdf_text_to_spans("", _decode_pdf(data))
    kinds = [s["kind"] for s in spans]
    assert kinds.count("heading") >= 3  # 2 page markers + 'Chapter 1'
    assert "list" in kinds and "paragraph" in kinds


def test_pdf_objstm_xref_stream_roundtrip():
    """C1 modern layout (round-3 verdict item #2): PDF 1.5 with every
    non-stream object packed into a /ObjStm compressed object stream and
    located by a /Type /XRef cross-reference stream (W fields, PNG Up
    predictor) decodes identically to the classic-xref build."""
    from eget_spark.sources.converters import _decode_pdf
    from eget_spark.sources.pdfmini import build_pdf_bytes, decode_pdf_bytes

    pages = [
        "Chapter 1\nOpening paragraph text here.\n- alpha\n- beta",
        "SECTION TWO\nSecond page (with parens) and a \\ backslash.",
        "tail page",
    ]
    modern = build_pdf_bytes(pages, objstm=True)
    assert b"/ObjStm" in modern and b"/XRef" in modern
    assert b"\nxref\n" not in modern and b"trailer" not in modern  # no classic table
    assert decode_pdf_bytes(modern) == pages
    assert _decode_pdf(modern) == pages  # converter entry sees it too
    assert decode_pdf_bytes(build_pdf_bytes(pages)) == pages  # classic unchanged


def test_pdf_xref_locates_objects_with_endobj_in_stream_bytes():
    """Binary stream payloads may contain the byte sequence 'endobj';
    the regex whole-file scan truncates there, but xref-driven location
    slices the stream by /Length so the object survives intact."""
    from eget_spark.sources.pdfmini import _obj_at, _objects

    payload = b"xxxx endobj 99 0 obj forged endobj" + b"y" * 6
    data = (
        b"7 0 obj\n<< /Length %d >>\nstream\n" % len(payload)
        + payload
        + b"\nendstream\nendobj\n"
    )
    num, body = _obj_at(data, 0)
    assert num == 7 and payload in body
    # the regex scan demonstrably truncates the same object
    assert payload not in _objects(data)[7]


def test_pdf_incremental_update_prev_chain():
    """Incremental updates: an appended xref section with /Prev must win
    for the objects it redefines while older sections still locate the
    rest (newest-first precedence)."""
    from eget_spark.sources.pdfmini import build_pdf_bytes, decode_pdf_bytes

    base = build_pdf_bytes(["original text"])
    # previous startxref offset of the base file
    import re

    prev_off = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    # append a replacement content stream for object 5 (the page content)
    new_raw = b"BT /F1 11 Tf 50 780 Td\n(updated text) Tj 0 -14 Td\nET"
    obj_off = len(base)
    update = (
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(new_raw)
        + new_raw
        + b"\nendstream\nendobj\n"
    )
    xref_off = obj_off + len(update)
    update += (
        b"xref\n5 1\n"
        + b"%010d 00000 n \n" % obj_off
        + b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n" % prev_off
        + b"startxref\n%d\n%%%%EOF\n" % xref_off
    )
    assert decode_pdf_bytes(base + update) == ["updated text"]


def test_png_unpredict_filters():
    """All five PNG row filters reverse correctly (xref streams usually
    use Up=2, but writers may emit any)."""
    from eget_spark.sources.pdfmini import _png_unpredict

    rows = [bytes([10, 20, 30, 40]), bytes([15, 25, 35, 45]), bytes([5, 5, 5, 5])]

    def enc(filters):
        out, prev = bytearray(), bytes(4)
        for f, r in zip(filters, rows):
            out.append(f)
            for x in range(4):
                a = r[x - 1] if x >= 1 else 0
                b, c = prev[x], (prev[x - 1] if x >= 1 else 0)
                if f == 0:
                    out.append(r[x])
                elif f == 1:
                    out.append((r[x] - a) & 0xFF)
                elif f == 2:
                    out.append((r[x] - b) & 0xFF)
                elif f == 3:
                    out.append((r[x] - ((a + b) >> 1)) & 0xFF)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    out.append((r[x] - pred) & 0xFF)
            prev = r
        return bytes(out)

    want = b"".join(rows)
    for trio in ([0, 1, 2], [3, 4, 2], [4, 4, 4]):
        assert _png_unpredict(enc(trio), columns=4) == want


def test_xlsx_stdlib_shared_strings_and_row_gaps():
    """Real-world XLSX stores strings via sharedStrings.xml (our writer
    uses inline strings) — hand-build an archive exercising the shared
    table, multi-run <si> concatenation, missing rows, and column gaps."""
    import io
    import zipfile

    from eget_spark.sources.ooxml import decode_xlsx_bytes

    ct = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "</Types>"
    )
    wb = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="SS" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">'
        "<si><t>hello</t></si>"
        "<si><r><t>multi</t></r><r><t xml:space=\"preserve\"> run</t></r></si>"
        "</sst>"
    )
    # row 1: A1 shared[0], C1 shared[1] (gap at B1); row 3 exists, row 2 missing
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
        '<row r="3"><c r="B3"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    sheets = decode_xlsx_bytes(buf.getvalue())
    assert [t for t, _ in sheets] == ["SS"]
    rows = sheets[0][1]
    assert rows[0] == ["hello", None, "multi run"]  # gap -> None, si runs joined
    assert rows[1] == []  # missing row preserved as empty
    assert rows[2] == [None, 42]


def test_docx_stdlib_tabs_breaks_and_toggle_props():
    """Run text must include w:tab/w:br controls (python-docx Run.text
    parity) and toggle props respect explicit off values."""
    import io
    import zipfile

    from eget_spark.sources.ooxml import decode_docx_bytes

    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body>"
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
        '<w:p><w:r><w:rPr><w:b w:val="0"/><w:i/></w:rPr><w:t>styled</w:t></w:r></w:p>'
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    props, events = decode_docx_bytes(buf.getvalue())
    assert props == {}
    (k1, p1), (k2, p2) = events
    assert p1["text"] == "a\tb\nc"
    text, bold, italic, underline = p2["runs"][0]
    assert (text, bold, italic, underline) == ("styled", False, True, False)


def test_pdf_lzw_filter_roundtrip():
    """Round-5: LZWDecode content streams (pdfmini spec-7.4.4 stdlib
    implementation) decode identically to Flate — including variable
    code-width growth past 9 bits and the KwKwK self-referencing case."""
    from eget_spark.sources.pdfmini import (
        _lzw_decode,
        _lzw_encode,
        build_pdf_bytes,
        decode_pdf_bytes,
    )

    # unit roundtrips: repetitive (deep table), alternating (KwKwK-ish),
    # and one long enough to push the code width to 11+ bits
    cases = [
        b"",
        b"a",
        b"aaaaaaaaaaaaaaaaaaaaaa",
        b"abababababababababab",
        (b"the quick brown fox jumps over the lazy dog. " * 300),
        bytes(range(256)) * 30,
    ]
    for blob in cases:
        assert _lzw_decode(_lzw_encode(blob)) == blob
    # end-to-end through the PDF object graph
    pages = [
        "Chapter 1\nrepeat repeat repeat repeat repeat.",
        "tail page with more text layers.",
    ]
    lzw_pdf = build_pdf_bytes(pages, compress="lzw")
    assert b"/LZWDecode" in lzw_pdf and b"/FlateDecode" not in lzw_pdf
    assert decode_pdf_bytes(lzw_pdf) == pages


def test_pdf_type0_tounicode_cmap():
    """Round-5 (verdict item #3): CID/Type0 composite-font text decodes
    through the embedded /ToUnicode CMap — 2-byte Identity-H codes,
    non-Latin text, surrogate pairs, and both bfrange forms."""
    from eget_spark.sources.converters import _decode_pdf
    from eget_spark.sources.pdfmini import (
        _parse_tounicode,
        build_pdf_type0_bytes,
        decode_pdf_bytes,
    )

    pages = [
        "αλφα βήτα γάμμα 123.",
        "日本語のテスト 😀 mixed latin.",
    ]
    pdf = build_pdf_type0_bytes(pages)
    assert b"/Type0" in pdf and b"/Identity-H" in pdf and b"/ToUnicode" in pdf
    assert decode_pdf_bytes(pdf) == pages
    assert _decode_pdf(pdf) == pages  # converter entry path

    # CMap parser unit: bfchar + incrementing bfrange + array bfrange
    cmap = b"""
/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0001> <0041>
<0002> <4e2d>
endbfchar
2 beginbfrange
<0010> <0012> <0061>
<0020> <0021> [<00c9> <d83dde00>]
endbfrange
endcmap end end
"""
    m2u, code_len = _parse_tounicode(cmap)
    assert code_len == 2
    assert m2u[1] == "A" and m2u[2] == "中"
    assert (m2u[0x10], m2u[0x11], m2u[0x12]) == ("a", "b", "c")
    assert m2u[0x20] == "É" and m2u[0x21] == "\U0001f600"


def test_pdf_xref_19_byte_entries():
    """Round-5 (advice item): classic xref entries written as 19 bytes
    (lone \\n line ending) must not misalign the table scan — the parser
    advances by the matched entry length, not a fixed 20-byte stride."""
    import re

    from eget_spark.sources.pdfmini import (
        _parse_xref_table,
        build_pdf_bytes,
        decode_pdf_bytes,
    )

    pages = ["page one text.", "page two text."]
    pdf = build_pdf_bytes(pages)
    x = pdf.find(b"xref")
    narrowed = pdf[:x] + pdf[x:].replace(b" n \n", b" n\n").replace(
        b" f \n", b" f\n"
    )
    off = int(re.search(rb"startxref\s+(\d+)", narrowed).group(1))
    wide_entries, _ = _parse_xref_table(pdf, off)
    narrow_entries, _ = _parse_xref_table(narrowed, off)
    assert narrow_entries == wide_entries and len(narrow_entries) >= 6
    assert decode_pdf_bytes(narrowed) == pages
