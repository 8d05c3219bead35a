"""Document converters (C1-C3, SURVEY.md §2.9): file bytes -> span rows.

The reference converts PDF/DOCX/XLSX into an ordered DocumentElement
sequence (services/converters/converters/{pdf,docx,xlsx}_converter.py); the
engine equivalent is ``spark.read.format('binaryFile')`` ->
``mapInPandas(file_to_spans)`` — one file per row, the per-file walk in
Python, parallel across files, emitting the interleaved span model.

Binary parsers (PyPDF2 / python-docx / openpyxl) are NOT in this
environment, so the byte-level decode step is import-gated: converters
raise a clear NotImplementedError when the library is missing, while the
*classification heuristics* (the actual computation the reference performs
on extracted text — heading detection, heading level, list detection,
table parsing, cell formatting, PDF date normalization) are pure functions
reimplemented here and fully tested on strings
(pdf_converter.py:359-419, :256-279; xlsx_converter.py:153-166).
`pdf_text_to_spans` runs the whole PDF text-layer pipeline on an extracted
text page — the environment-independent 90% of C1.
"""

from __future__ import annotations

import json as _json
import re
from datetime import datetime
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import DOCS_SCHEMA

# --- C1 text-layer heuristics (pdf_converter.py:359-419) --------------------

_HEADING_PATTERNS = [
    r"^\d+[\.\)]\s",  # numbered headings
    r"^[A-Z][^a-z]+$",  # all caps
    r"^(?:Chapter|Section|Part)\s+\d+",  # common heading starts
    r"^\d+\.\d+\s",  # hierarchical numbering
]

_LIST_PATTERNS = [
    r"^\s*[\-\*•]\s",  # bullets
    r"^\s*\d+[\.\)]\s",  # numbered
    r"^\s*[a-z][\.\)]\s",  # alphabetical
    r"^\s*\[[xX\s]\]",  # checkboxes
    r"^\s*[-–—]\s",  # dashes
]


def is_heading(text: str) -> bool:
    """pdf_converter.py:359-384: short, no sentence punctuation, matches a
    heading pattern."""
    if len(text) > 100:
        return False
    text = text.strip()
    if not text:
        return False
    if text[-1] in {".", "?", "!"}:
        return False
    return any(re.match(p, text) for p in _HEADING_PATTERNS)


def heading_level(text: str) -> int:
    """pdf_converter.py:386-402."""
    text = text.strip()
    if re.match(r"^(?:Chapter|Book)\s+\d+", text, re.I):
        return 1
    if re.match(r"^(?:Section|Part)\s+\d+", text, re.I):
        return 2
    if re.match(r"^\d+\.\d+\s", text):
        return 3
    if re.match(r"^\d+[\.\)]\s", text):
        return 3
    if text.isupper():
        return 2
    return 3


def is_list_item(text: str) -> bool:
    """pdf_converter.py:404-419."""
    text = text.strip()
    if not text:
        return False
    return any(re.match(p, text) for p in _LIST_PATTERNS)


def parse_table_text(table_text: str) -> list[list[str]]:
    """pdf_converter.py:256-279: split '|' grids or >=2-space columns,
    skipping +---+ separator lines."""
    rows: list[list[str]] = []
    for line in table_text.split("\n"):
        if re.match(r"^[\|\+][-\+]+[\|\+]$", line):
            continue
        if "|" in line:
            cells = [c.strip() for c in line.split("|")]
            if cells and not cells[0]:
                cells = cells[1:]
            if cells and not cells[-1]:
                cells = cells[:-1]
        else:
            cells = [c.strip() for c in re.split(r"\s{2,}", line.strip())]
        if cells:
            rows.append(cells)
    return rows


def pdf_date_to_iso(raw: str) -> str | None:
    """X18 (pdf_converter.py:94-103): 'D:YYYYMMDDHHMMSS...' -> ISO."""
    m = re.match(r"^D:(\d{14})", raw or "")
    if not m:
        return None
    return datetime.strptime(m.group(1), "%Y%m%d%H%M%S").isoformat()


def format_cell(value: Any) -> str:
    """X20 (xlsx_converter.py:153-166)."""
    if value is None:
        return ""
    if isinstance(value, datetime):
        return value.isoformat()
    if isinstance(value, float) and value.is_integer():
        return str(int(value))
    return str(value)


# --- C1: PDF text layer -> spans --------------------------------------------


def pdf_text_to_spans(doc_id: str, pages: list[str]) -> list[dict]:
    """The per-page classification walk of pdf_converter.py:105-357 on
    already-extracted text: page heading markers, table regions, then
    heading/list/paragraph classification line by line."""
    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str = "", ref: str = "") -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": off})
        off += 1

    for pageno, text in enumerate(pages, start=1):
        add("heading", f"## Page {pageno}")
        # table regions (pdf_converter.py:211-241)
        consumed: list[tuple[int, int]] = []
        for pat in (
            r"[\|\+][-\+]+[\|\+][\s\S]+?[\|\+][-\+]+[\|\+]",
            r"(\s{2,}\S+){3,}[\s\S]+?(\s{2,}\S+){3,}",
        ):
            for m in re.finditer(pat, text):
                rows = parse_table_text(m.group())
                if rows and len(rows) > 1:
                    consumed.append((m.start(), m.end()))
                    add(
                        "table",
                        "\n".join("\t".join(r) for r in rows),
                    )
        # line classification outside tables
        current_list: list[str] = []

        def flush_list() -> None:
            nonlocal current_list
            if current_list:
                add("list", "\n".join(current_list))
                current_list = []

        para: list[str] = []

        def flush_para() -> None:
            nonlocal para
            if para:
                add("paragraph", " ".join(para))
                para = []

        pos = 0
        for line in text.split("\n"):
            start, pos = pos, pos + len(line) + 1
            if any(s <= start < e for s, e in consumed):
                continue
            t = line.strip()
            if not t:
                flush_list()
                flush_para()
            elif is_heading(t):
                flush_list()
                flush_para()
                add("heading", "#" * heading_level(t) + " " + t)
            elif is_list_item(t):
                flush_para()
                current_list.append(re.sub(r"^\s*[\-\*•]\s*", "", t))
            else:
                flush_list()
                para.append(t)
        flush_list()
        flush_para()
    return spans


# --- C3: XLSX structured model -> spans (xlsx_converter.py:94-151) ----------


def xlsx_sheets_to_spans(sheets: list[tuple[str, list[list]]]) -> list[dict]:
    """Sheet walk on the already-decoded cell model: per sheet a
    '## Sheet: title' heading, then the whole sheet as ONE table span —
    all-None rows skipped, trailing Nones stripped, cells formatted per
    X20, rows padded to max_cols (xlsx_converter.py:104-151)."""
    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str) -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": "", "offset": off})
        off += 1

    for title, rows in sheets:
        add("heading", f"## Sheet: {title}")
        table_data: list[list[str]] = []
        max_cols = 0
        for row in rows:
            if any(cell is not None for cell in row):
                row = list(row)
                while row and row[-1] is None:
                    row = row[:-1]
                if row:
                    max_cols = max(max_cols, len(row))
                    table_data.append([format_cell(c) for c in row])
        for row in table_data:
            while len(row) < max_cols:
                row.append("")
        if table_data:
            add("table", "\n".join("\t".join(r) for r in table_data))
    return spans


# --- C2: DOCX structured model -> spans (docx_converter.py:124-339) ----------


def _docx_runs_to_text(runs: list[tuple]) -> str:
    """Inline run formatting (docx_converter.py:296-310): bold -> **,
    italic -> *, underline -> __, applied in that order; whitespace-only
    runs dropped; runs joined with ''."""
    parts = []
    for text, bold, italic, underline in runs:
        if not text.strip():
            continue
        if bold:
            text = f"**{text}**"
        if italic:
            text = f"*{text}*"
        if underline:
            text = f"__{text}__"
        parts.append(text)
    return "".join(parts)


def docx_blocks_to_spans(blocks: list[dict]) -> list[dict]:
    """Block walk on the already-decoded document model. Block shapes:
    {'type':'heading','text':str,'level':int}
    {'type':'paragraph','runs':[(text,bold,italic,underline), ...]}
    {'type':'list','items':[str,...],'ordered':bool}
    {'type':'table','rows':[[str,...], ...]}
    {'type':'image','alt':str,'ref':str}
    """
    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str, ref: str = "") -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": off})
        off += 1

    for b in blocks:
        t = b["type"]
        if t == "metadata":
            # core-properties element (docx_converter.py:95-122); renders to
            # "" in markdown (document_structure.py metadata branch) but is
            # carried as a span for structured consumers
            add("metadata", _json.dumps(b["props"], sort_keys=True))
        elif t == "heading":
            add("heading", "#" * int(b.get("level", 1)) + " " + b["text"])
        elif t == "paragraph":
            text = _docx_runs_to_text(b["runs"])
            if text:
                add("paragraph", text)
        elif t == "list":
            items = b["items"]
            if b.get("ordered"):
                add("list", "\n".join(f"{i}. {it}" for i, it in enumerate(items, 1)))
            else:
                add("list", "\n".join(items))
        elif t == "table":
            # cell text: paragraphs joined with ' ' (docx_converter.py:325)
            rows = [
                "\t".join(str(c) for c in row) for row in b["rows"] if row
            ]
            if rows:
                add("table", "\n".join(rows))
        elif t == "image":
            add("image", b.get("alt", ""), b.get("ref", ""))
    return spans


# --- binaryFile -> spans (library decoders with stdlib fallback) -------------


def _decode_pdf(data: bytes) -> list[str]:
    """PDF bytes -> page texts.  PyPDF2 when installed (cluster parity);
    otherwise the stdlib zlib FlateDecode extractor (sources/pdfmini.py)
    covers uncompressed and Flate text streams — the common case the
    reference handles (pdf_converter.py:23-121)."""
    try:
        import io

        import PyPDF2  # noqa: F401
    except ImportError:
        from .pdfmini import decode_pdf_bytes

        return decode_pdf_bytes(data)
    reader = PyPDF2.PdfReader(io.BytesIO(data))
    return [p.extract_text() or "" for p in reader.pages]


def docx_events_to_blocks(props: dict, events) -> list[dict]:
    """The reference DOCX body walk (docx_converter.py:33-339) as a pure
    state machine over a decoded event stream — shared by the python-docx
    and stdlib (sources/ooxml.py) decode paths so their list/heading
    semantics can never drift.  Events: ``("p", {"text", "style", "runs",
    "num"})`` / ``("tbl", rows)``; ``num`` is None or
    ``{"level": int, "list_id": str}``.

    Reference quirks reproduced deliberately:
    - headings do NOT close open lists (only a regular paragraph or a
      numId change does — :124-150, :290-294), so list blocks appear where
      they are *closed*, not where they start;
    - a list still open at end-of-document is never flushed (convert()
      :66-71 has no final _close_current_list) and is dropped;
    - the level-stack pop discards prior same-level items of the same
      numId run (:259-272), keeping only the last."""
    blocks: list[dict] = []
    if props:
        blocks.append({"type": "metadata", "props": props})

    current_list_id: str | None = None
    list_stack: list[dict] = []

    def close_lists() -> None:
        nonlocal current_list_id
        for li in list_stack:
            blocks.append(
                {"type": "list", "items": li["items"], "ordered": li["ordered"]}
            )
        list_stack.clear()
        current_list_id = None

    for kind, payload in events:
        if kind == "p":
            text = payload["text"]
            if not text.strip():
                continue
            style_name = payload.get("style") or "Normal"
            if style_name.startswith("Heading"):
                try:
                    blocks.append(
                        {"type": "heading", "text": text, "level": int(style_name[-1])}
                    )
                    continue
                except ValueError:
                    pass
            num = payload.get("num")
            if num is not None:
                ordered = bool(re.match(r"^\d+\.?\s", text.strip()))
                if current_list_id != num["list_id"]:
                    close_lists()
                    current_list_id = num["list_id"]
                while list_stack and list_stack[-1]["level"] >= num["level"]:
                    list_stack.pop()
                list_stack.append(
                    {"level": num["level"], "ordered": ordered, "items": []}
                )
                list_stack[-1]["items"].append(text.strip())
                continue
            close_lists()
            blocks.append({"type": "paragraph", "runs": payload["runs"]})
        elif kind == "tbl":
            if payload:
                blocks.append({"type": "table", "rows": payload})
    # NOTE deliberately NO close_lists() here — reference parity (see above)
    return blocks


def _decode_docx(data: bytes) -> list[dict]:
    """DOCX bytes -> the block model consumed by docx_blocks_to_spans.
    python-docx when installed (cluster parity); otherwise the stdlib
    zipfile+ElementTree decoder (sources/ooxml.py).  Both paths feed the
    SAME walk (docx_events_to_blocks) — only byte->event decoding
    differs."""
    try:
        import io

        from docx import Document  # noqa: F401
        from docx.oxml.table import CT_Tbl
        from docx.oxml.text.paragraph import CT_P
        from docx.table import Table
        from docx.text.paragraph import Paragraph
    except ImportError:
        from .ooxml import decode_docx_bytes

        props, events = decode_docx_bytes(data)
        return docx_events_to_blocks(props, events)

    doc = Document(io.BytesIO(data))
    props = {}
    cp = doc.core_properties
    for key in (
        "title", "author", "comments", "category", "last_modified_by",
        "revision", "keywords", "subject",
    ):
        v = getattr(cp, key, None)
        if v is not None and v != "":
            props[key] = str(v)
    for key in ("created", "modified"):
        v = getattr(cp, key, None)
        if v is not None:
            props[key] = v.isoformat()

    def list_info(p) -> dict | None:
        if p._element.pPr is None:
            return None
        num_pr = p._element.pPr.xpath("./w:numPr")
        if not num_pr:
            return None
        ilvl = num_pr[0].xpath("./w:ilvl/@w:val")
        num_id = num_pr[0].xpath("./w:numId/@w:val")
        if not (ilvl and num_id):
            return None
        return {"level": int(ilvl[0]), "list_id": num_id[0]}

    events = []
    for element in doc.element.body:
        if isinstance(element, CT_P):
            p = Paragraph(element, doc)
            events.append(
                (
                    "p",
                    {
                        "text": p.text,
                        "style": p.style.name if p.style else "Normal",
                        "num": list_info(p),
                        "runs": [
                            (r.text, bool(r.bold), bool(r.italic), bool(r.underline))
                            for r in p.runs
                        ],
                    },
                )
            )
        elif isinstance(element, CT_Tbl):
            table = Table(element, doc)
            events.append(
                (
                    "tbl",
                    [
                        [
                            " ".join(
                                q.text.strip() for q in cell.paragraphs if q.text.strip()
                            )
                            for cell in row.cells
                        ]
                        for row in table.rows
                    ],
                )
            )
    return docx_events_to_blocks(props, events)


def _decode_xlsx(data: bytes) -> list[tuple[str, list[list]]]:
    """XLSX bytes -> (sheet title, value rows) pairs for xlsx_sheets_to_spans,
    per xlsx_converter.py:22-151: data_only values, and a sheet is included
    only if its FIRST row has a non-None cell (_has_content :96-104 checks
    row 1 only — a sheet whose data starts at row 2 is skipped; reference
    quirk, reproduced).  openpyxl when installed; stdlib
    zipfile+ElementTree decoder (sources/ooxml.py) otherwise."""
    try:
        import io

        from openpyxl import load_workbook  # noqa: F401
    except ImportError:
        from .ooxml import decode_xlsx_bytes

        return decode_xlsx_bytes(data)
    wb = load_workbook(io.BytesIO(data), data_only=True, read_only=True)
    try:
        out: list[tuple[str, list[list]]] = []
        for name in wb.sheetnames:
            sheet = wb[name]
            first = next(sheet.iter_rows(min_row=1, max_row=1, values_only=True), None)
            if first is None or not any(c is not None for c in first):
                continue
            out.append((sheet.title, [list(r) for r in sheet.iter_rows(values_only=True)]))
        return out
    finally:
        wb.close()


def _convert_one(ext: str, content: bytes) -> list[dict] | None:
    """Extension dispatch (converter_factory.py:6-29 analogue).

    txt/md are an engine extension beyond the reference's FileType set:
    plain text routes through the same text-layer classification pipeline
    as PDF pages (one page, no binary decode needed)."""
    if ext == "pdf":
        return pdf_text_to_spans("", _decode_pdf(content))
    if ext == "docx":
        return docx_blocks_to_spans(_decode_docx(content))
    if ext == "xlsx":
        return xlsx_sheets_to_spans(_decode_xlsx(content))
    if ext == "pptx":
        from .ooxml import decode_pptx_bytes

        return pptx_events_to_spans(decode_pptx_bytes(content))
    if ext in ("txt", "md"):
        return pdf_text_to_spans("", [content.decode("utf-8", errors="replace")])
    return None


_SPANS_DDL = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def convert_files(files: DataFrame, dedupe_content: bool = True) -> DataFrame:
    """S5: binaryFile rows (path, content) -> docs-shaped span rows.

    ``dedupe_content`` is the reference's conversion cache
    (conversion_service.py:38-79 keys results by content hash) as
    dataflow: identical (extension, bytes) payloads are decoded ONCE and
    the result is joined back to every path — at corpus scale the decode
    is the expensive stage, so duplicate uploads cost one conversion."""
    work = files.select("path", "content").withColumn(
        "ext", F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, spans_out = [], []
            for key, ext, content in zip(pdf["key"], pdf["ext"], pdf["content"]):
                spans = _convert_one(ext, bytes(content))
                if spans is None:
                    continue
                keys.append(key)
                spans_out.append(spans)
            if keys:
                yield pd.DataFrame({"key": keys, "spans": spans_out})

    if dedupe_content:
        keyed = work.withColumn(
            "key", F.concat_ws(":", F.col("ext"), F.sha2(F.col("content"), 256))
        )
        converted = keyed.dropDuplicates(["key"]).select(
            "key", "ext", "content"
        ).mapInPandas(run, schema=f"key string, spans {_SPANS_DDL}")
        joined = keyed.select("path", "key").join(converted, "key")
    else:
        # paths are unique by contract: decode in place, no dedup
        # aggregate and no join-back shuffle
        joined = work.withColumn("key", F.col("path")).select(
            "key", "ext", "content"
        ).mapInPandas(run, schema=f"key string, spans {_SPANS_DDL}").withColumn(
            "path", F.col("key")
        )
    return joined.select(
        F.col("path").alias("doc_id"),
        "spans",
        F.lit("file://").alias("host"),
        F.array().cast("array<string>").alias("true_out_links"),
    )


# --- C4: PPTX events -> spans (engine extension; the reference declares
# FileType.PPTX but ships no converter — converter_factory.py:37) -------------


def pptx_events_to_spans(slides: list[list[tuple]]) -> list[dict]:
    """Pinned slide walk (mirrors the C3 sheet walk): per slide i
    (1-based) a heading span ``## Slide i``, ``: <first title>``-suffixed
    when the slide has a title; extra title paragraphs demote to
    paragraph spans; CONSECUTIVE bullet paragraphs merge into one list
    span (two-space indent per level); non-bullet paragraphs are
    paragraph spans; tables render rows tab-joined, newline-stacked."""
    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str) -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": "", "offset": off})
        off += 1

    for i, events in enumerate(slides, 1):
        titles = [e[1] for e in events if e[0] == "title"]
        add(
            "heading",
            f"## Slide {i}" + (f": {titles[0]}" if titles else ""),
        )
        seen_title = False
        bullets: list[str] = []

        def flush() -> None:
            nonlocal bullets
            if bullets:
                add("list", "\n".join(bullets))
                bullets = []

        for e in events:
            if e[0] == "title":
                if seen_title:
                    flush()
                    add("paragraph", e[1])
                seen_title = True
            elif e[0] == "para":
                _, text, bullet, lvl = e
                if bullet:
                    bullets.append("  " * int(lvl) + text)
                else:
                    flush()
                    add("paragraph", text)
            elif e[0] == "tbl":
                flush()
                rows = ["\t".join(str(c) for c in row) for row in e[1] if row]
                if rows:
                    add("table", "\n".join(rows))
        flush()
    return spans
