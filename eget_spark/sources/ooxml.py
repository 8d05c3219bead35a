"""Stdlib OOXML byte codecs (C2 DOCX / C3 XLSX, SURVEY.md §2.9).

DOCX and XLSX are zip archives of XML parts, so the byte-level decode the
reference performs through python-docx / openpyxl
(services/converters/converters/docx_converter.py:33-339,
xlsx_converter.py:22-151) is reproducible with ``zipfile`` +
``xml.etree.ElementTree`` alone — no third-party dependency.  This module
provides:

- ``decode_docx_bytes`` -> (core-properties dict, body event stream) —
  the inputs to ``converters.docx_events_to_blocks`` (the shared
  reference-walk state machine, so the stdlib and python-docx paths can
  never drift in list/heading semantics);
- ``decode_xlsx_bytes`` -> [(sheet title, value rows)] — the input to
  ``converters.xlsx_sheets_to_spans``;
- ``build_docx_bytes`` / ``build_xlsx_bytes`` — minimal deterministic
  writers used by the roundtrip tests and the q49 oracle query to
  synthesize real files in-memory (no fixtures on disk, no libraries).

Known deltas vs the library decoders (documented, not silent):
- XLSX dates: cells styled with a date number format are converted from
  the 1900-epoch serial via the standard 1899-12-30 base (Excel's
  leap-year-bug convention for serials > 59); sub-day precision is
  rounded to the second, matching openpyxl.
"""

from __future__ import annotations

import io
import re
import zipfile
from datetime import datetime, timedelta
from xml.etree import ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_CP = "{http://schemas.openxmlformats.org/package/2006/metadata/core-properties}"
_DC = "{http://purl.org/dc/elements/1.1/}"
_DCT = "{http://purl.org/dc/terms/}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PR = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


# --- DOCX ---------------------------------------------------------------------

_CORE_PROP_TAGS = [
    # (props key, element tag) — python-docx CoreProperties attribute map
    ("title", _DC + "title"),
    ("author", _DC + "creator"),
    ("comments", _DC + "description"),
    ("category", _CP + "category"),
    ("last_modified_by", _CP + "lastModifiedBy"),
    ("revision", _CP + "revision"),
    ("keywords", _CP + "keywords"),
    ("subject", _DC + "subject"),
]
_CORE_DATE_TAGS = [("created", _DCT + "created"), ("modified", _DCT + "modified")]


def _parse_core_props(zf: zipfile.ZipFile) -> dict:
    try:
        root = ET.fromstring(zf.read("docProps/core.xml"))
    except KeyError:
        return {}
    props: dict = {}
    for key, tag in _CORE_PROP_TAGS:
        el = root.find(tag)
        if el is not None and (el.text or "").strip():
            props[key] = el.text
    for key, tag in _CORE_DATE_TAGS:
        el = root.find(tag)
        if el is not None and (el.text or "").strip():
            t = el.text.strip().replace("Z", "+00:00")
            try:
                props[key] = datetime.fromisoformat(t).isoformat()
            except ValueError:
                props[key] = el.text.strip()
    return props


def _style_names(zf: zipfile.ZipFile) -> dict[str, str]:
    """styleId -> style name from word/styles.xml (python-docx resolves
    ``p.style.name`` the same way; built-in lowercase names like
    'heading 1' are title-cased to match its BabelFish aliasing)."""
    out: dict[str, str] = {}
    try:
        root = ET.fromstring(zf.read("word/styles.xml"))
    except KeyError:
        return out
    for st in root.findall(_W + "style"):
        sid = st.get(_W + "styleId")
        name_el = st.find(_W + "name")
        if sid and name_el is not None:
            name = name_el.get(_W + "val") or sid
            if name.lower().startswith("heading "):
                name = "Heading " + name.split(" ", 1)[1]
            out[sid] = name
    return out


def _run_text(r) -> str:
    """w:t text plus tab/br/cr controls — python-docx ``Run.text``."""
    parts: list[str] = []
    for child in r:
        tag = child.tag
        if tag == _W + "t":
            parts.append(ooxml_unescape(child.text or ""))
        elif tag == _W + "tab":
            parts.append("\t")
        elif tag in (_W + "br", _W + "cr"):
            parts.append("\n")
    return "".join(parts)


def _flag(rpr, tag: str) -> bool:
    """Toggle property: present and not explicitly turned off."""
    if rpr is None:
        return False
    el = rpr.find(_W + tag)
    if el is None:
        return False
    val = el.get(_W + "val")
    return val not in ("0", "false", "none", "off")


def _para_event(p, styles: dict[str, str]) -> dict:
    ppr = p.find(_W + "pPr")
    style = "Normal"
    num = None
    if ppr is not None:
        ps = ppr.find(_W + "pStyle")
        if ps is not None:
            style = styles.get(ps.get(_W + "val"), ps.get(_W + "val") or "Normal")
        npr = ppr.find(_W + "numPr")
        if npr is not None:
            ilvl = npr.find(_W + "ilvl")
            nid = npr.find(_W + "numId")
            if ilvl is not None and nid is not None:
                num = {"level": int(ilvl.get(_W + "val")), "list_id": nid.get(_W + "val")}
    runs = []
    for r in p.findall(_W + "r"):
        rpr = r.find(_W + "rPr")
        runs.append(
            (
                _run_text(r),
                _flag(rpr, "b"),
                _flag(rpr, "i"),
                _flag(rpr, "u"),
            )
        )
    return {
        "text": "".join(t for t, *_ in runs),
        "style": style,
        "runs": runs,
        "num": num,
    }


def _table_rows(tbl) -> list[list[str]]:
    """Rows of cell text with python-docx ``row.cells`` merge semantics
    (docx_converter.py:319-339 iterates ``row.cells``): a horizontally
    merged ``w:tc`` (``w:gridSpan``) repeats per grid column, and a
    vertical-merge continuation (``w:vMerge`` without ``restart``)
    repeats the text of the cell above in the same grid column."""
    rows: list[list[str]] = []
    for tr in tbl.findall(_W + "tr"):
        cells: list[str] = []
        for tc in tr.findall(_W + "tc"):
            paras = [
                "".join(_run_text(r) for r in p.findall(_W + "r"))
                for p in tc.findall(_W + "p")
            ]
            text = " ".join(t.strip() for t in paras if t.strip())
            span = 1
            tcpr = tc.find(_W + "tcPr")
            if tcpr is not None:
                gs = tcpr.find(_W + "gridSpan")
                if gs is not None:
                    span = max(1, int(gs.get(_W + "val") or 1))
                vm = tcpr.find(_W + "vMerge")
                if vm is not None and (vm.get(_W + "val") or "continue") != "restart":
                    prev = rows[-1] if rows else []
                    if len(prev) > len(cells):
                        text = prev[len(cells)]
            cells.extend([text] * span)
        rows.append(cells)
    return rows


def decode_docx_bytes(data: bytes):
    """DOCX bytes -> (core props dict, iterable of body events) with
    events ``("p", para_dict)`` / ``("tbl", rows)`` in document order —
    feed to ``converters.docx_events_to_blocks``."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        props = _parse_core_props(zf)
        styles = _style_names(zf)
        body = ET.fromstring(zf.read("word/document.xml")).find(_W + "body")
        events = []
        if body is not None:
            for el in body:
                if el.tag == _W + "p":
                    events.append(("p", _para_event(el, styles)))
                elif el.tag == _W + "tbl":
                    events.append(("tbl", _table_rows(el)))
        return props, events


# --- XLSX ---------------------------------------------------------------------

# built-in date/time number-format ids (ECMA-376 §18.8.30)
_DATE_FMT_IDS = set(range(14, 23)) | set(range(27, 37)) | {45, 46, 47, 50, 58}
_DATE_TOKEN_RE = re.compile(r"(?<!\\)[ymdhs]|(?<!\\)d{2}", re.I)
_EXCEL_EPOCH = datetime(1899, 12, 30)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall(_S + "si"):
        out.append(
            ooxml_unescape("".join(t.text or "" for t in si.iter(_S + "t")))
        )
    return out


def _date_styles(zf: zipfile.ZipFile) -> set[int]:
    """Indices into cellXfs whose number format is a date/time format."""
    try:
        root = ET.fromstring(zf.read("xl/styles.xml"))
    except KeyError:
        return set()
    custom_date: set[int] = set()
    num_fmts = root.find(_S + "numFmts")
    if num_fmts is not None:
        for nf in num_fmts.findall(_S + "numFmt"):
            code = nf.get("formatCode") or ""
            # strip quoted literals/colors then look for date tokens
            bare = re.sub(r'"[^"]*"|\[[^\]]*\]', "", code)
            if _DATE_TOKEN_RE.search(bare):
                custom_date.add(int(nf.get("numFmtId")))
    out: set[int] = set()
    xfs = root.find(_S + "cellXfs")
    if xfs is not None:
        for i, xf in enumerate(xfs.findall(_S + "xf")):
            fmt = int(xf.get("numFmtId") or 0)
            if fmt in _DATE_FMT_IDS or fmt in custom_date:
                out.add(i)
    return out


def _col_index(ref: str) -> int:
    """'B2' -> 1 (0-based column)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _serial_to_datetime(serial: float) -> datetime:
    dt = _EXCEL_EPOCH + timedelta(days=serial)
    # round to the second like openpyxl does for stored date serials
    micro = dt.microsecond
    dt = dt.replace(microsecond=0)
    if micro >= 500_000:
        dt += timedelta(seconds=1)
    return dt


def _cell_value(c, shared: list[str], date_xfs: set[int]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_S + "is")
        if is_el is None:
            return None
        return ooxml_unescape(
            "".join(el.text or "" for el in is_el.iter(_S + "t"))
        )
    v = c.find(_S + "v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        return shared[int(raw)]
    if t == "str" or t == "e":
        return ooxml_unescape(raw)
    if t == "b":
        return bool(int(raw))
    num = float(raw)
    if int(c.get("s") or 0) in date_xfs:
        return _serial_to_datetime(num)
    return int(num) if num.is_integer() and abs(num) < 1e15 else num


def _workbook_sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(title, part path)] in workbook order via the rels part."""
    rels: dict[str, str] = {}
    try:
        rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root.findall(_PR + "Relationship"):
            rels[rel.get("Id")] = rel.get("Target")
    except KeyError:
        pass
    root = ET.fromstring(zf.read("xl/workbook.xml"))
    out: list[tuple[str, str]] = []
    sheets = root.find(_S + "sheets")
    for i, sh in enumerate(sheets.findall(_S + "sheet") if sheets is not None else []):
        target = rels.get(sh.get(_R + "id")) or f"worksheets/sheet{i + 1}.xml"
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target[1:]
        out.append((sh.get("name"), target))
    return out


def decode_xlsx_bytes(data: bytes) -> list[tuple[str, list[list]]]:
    """XLSX bytes -> [(sheet title, value rows)] matching openpyxl's
    ``iter_rows(values_only=True)`` model: cached values only (formula
    results, not formulas), gaps as None, empty rows preserved.  The
    first-row content gate (reference quirk, xlsx_converter.py:96-104)
    is applied here exactly like ``_decode_xlsx``."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        shared = _shared_strings(zf)
        date_xfs = _date_styles(zf)
        out: list[tuple[str, list[list]]] = []
        for title, part in _workbook_sheets(zf):
            try:
                root = ET.fromstring(zf.read(part))
            except KeyError:
                continue
            sheet_data = root.find(_S + "sheetData")
            row_map: dict[int, dict[int, object]] = {}
            max_row = 0
            if sheet_data is not None:
                for r_i, row in enumerate(sheet_data.findall(_S + "row"), start=1):
                    rn = int(row.get("r") or r_i)
                    cells: dict[int, object] = {}
                    for c_i, c in enumerate(row.findall(_S + "c")):
                        ref = c.get("r")
                        ci = _col_index(ref) if ref else c_i
                        cells[ci] = _cell_value(c, shared, date_xfs)
                    row_map[rn] = cells
                    max_row = max(max_row, rn)
            rows: list[list] = []
            for rn in range(1, max_row + 1):
                cells = row_map.get(rn, {})
                width = max(cells.keys()) + 1 if cells else 0
                rows.append([cells.get(i) for i in range(width)])
            first = rows[0] if rows else None
            if first is None or not any(c is not None for c in first):
                continue  # reference quirk: row-1-only content gate
            out.append((title, rows))
        return out


# --- minimal writers (tests + q49 oracle; deterministic, stdlib-only) ---------

_CT_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
{overrides}</Types>"""

_RELS_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}</Relationships>"""


# XML 1.0 cannot represent control characters / lone surrogates at all;
# OOXML stores them as _xHHHH_ escapes (ECMA-376 §22.4.2.4, the same
# convention Excel itself writes). \r is technically legal XML but parsers
# normalize it to \n in text content, so it must be escaped to roundtrip.
_ILLEGAL_XML_RE = re.compile(
    "[\x00-\x08\x0b\x0c\x0d\x0e-\x1f\ud800-\udfff￾￿]"
)
_X_ESC_RE = re.compile(r"_x([0-9A-Fa-f]{4})_")


def _ooxml_escape_chars(s: str) -> str:
    # a literal "_xHHHH_" in user text is itself escaped (_x005F_xHHHH_)
    s = _X_ESC_RE.sub(lambda m: "_x005F_x" + m.group(1) + "_", s)
    return _ILLEGAL_XML_RE.sub(lambda m: "_x%04X_" % ord(m.group()), s)


def ooxml_unescape(s: str) -> str:
    """Decode OOXML _xHHHH_ character escapes (readers apply this to every
    string cell / run text; _x005F_xHHHH_ resolves to the literal)."""
    return _X_ESC_RE.sub(lambda m: chr(int(m.group(1), 16)), s)


def _esc(s: str) -> str:
    return (
        _ooxml_escape_chars(str(s))
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def build_docx_bytes(
    blocks: list[dict], props: dict | None = None
) -> bytes:
    """Minimal valid .docx from the converter block model (heading /
    paragraph-with-runs / list / table).  Inverse of the decode path for
    the roundtrip tests; list blocks emit one numPr'd paragraph per item
    sharing a numId so the decode walk reassembles them."""
    body: list[str] = []
    num_id = 0
    for b in blocks:
        t = b["type"]
        if t == "heading":
            body.append(
                f'<w:p><w:pPr><w:pStyle w:val="Heading{int(b.get("level", 1))}"/></w:pPr>'
                f"<w:r><w:t xml:space=\"preserve\">{_esc(b['text'])}</w:t></w:r></w:p>"
            )
        elif t == "paragraph":
            runs = []
            for text, bold, italic, underline in b["runs"]:
                rpr = "".join(
                    [
                        "<w:b/>" if bold else "",
                        "<w:i/>" if italic else "",
                        '<w:u w:val="single"/>' if underline else "",
                    ]
                )
                runs.append(
                    f"<w:r><w:rPr>{rpr}</w:rPr>"
                    f'<w:t xml:space="preserve">{_esc(text)}</w:t></w:r>'
                )
            body.append(f"<w:p>{''.join(runs)}</w:p>")
        elif t == "list":
            num_id += 1
            for item in b["items"]:
                text = f"{item}"
                body.append(
                    "<w:p><w:pPr><w:numPr>"
                    '<w:ilvl w:val="0"/>'
                    f'<w:numId w:val="{num_id}"/>'
                    "</w:numPr></w:pPr>"
                    f'<w:r><w:t xml:space="preserve">{_esc(text)}</w:t></w:r></w:p>'
                )
        elif t == "table":
            # a cell given as (text, span) emits w:gridSpan (horizontal
            # merge); (text, span, "restart"|"continue") adds w:vMerge —
            # the merged-cell roundtrip fixtures
            trs = []
            for row in b["rows"]:
                tcs = []
                for c in row:
                    span, vmerge = 1, None
                    if isinstance(c, tuple):
                        if len(c) >= 3:
                            vmerge = c[2]
                        c, span = c[0], c[1]
                    tc_props = []
                    if span > 1:
                        tc_props.append(f'<w:gridSpan w:val="{span}"/>')
                    if vmerge is not None:
                        tc_props.append(f'<w:vMerge w:val="{vmerge}"/>')
                    pr = f"<w:tcPr>{''.join(tc_props)}</w:tcPr>" if tc_props else ""
                    tcs.append(
                        f"<w:tc>{pr}<w:p><w:r>"
                        f'<w:t xml:space="preserve">{_esc(c)}</w:t>'
                        "</w:r></w:p></w:tc>"
                    )
                trs.append(f"<w:tr>{''.join(tcs)}</w:tr>")
            body.append(f"<w:tbl>{''.join(trs)}</w:tbl>")
    doc_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{''.join(body)}</w:body></w:document>"
    )
    styles = "".join(
        f'<w:style w:type="paragraph" w:styleId="Heading{i}">'
        f'<w:name w:val="heading {i}"/></w:style>'
        for i in range(1, 10)
    )
    styles_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:styles xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        '<w:style w:type="paragraph" w:styleId="Normal"><w:name w:val="Normal"/></w:style>'
        f"{styles}</w:styles>"
    )
    core_parts = []
    p = props or {}
    tag_of = {k: t for k, t in _CORE_PROP_TAGS + _CORE_DATE_TAGS}
    for key, val in p.items():
        tag = tag_of.get(key)
        if tag is None:
            continue
        m = re.match(r"\{(.+)\}(.+)", tag)
        uri, local = m.group(1), m.group(2)
        prefix = {"http://purl.org/dc/elements/1.1/": "dc",
                  "http://purl.org/dc/terms/": "dcterms"}.get(uri, "cp")
        extra = ' xsi:type="dcterms:W3CDTF"' if prefix == "dcterms" else ""
        core_parts.append(f"<{prefix}:{local}{extra}>{_esc(val)}</{prefix}:{local}>")
    core_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:dcterms="http://purl.org/dc/terms/" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
        f"{''.join(core_parts)}</cp:coreProperties>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            _CT_XML.format(
                overrides='<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
                '<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>'
                '<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>'
            ),
        )
        zf.writestr(
            "_rels/.rels",
            _RELS_XML.format(
                rels='<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
                '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>'
            ),
        )
        zf.writestr(
            "word/_rels/document.xml.rels",
            _RELS_XML.format(
                rels='<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
            ),
        )
        zf.writestr("word/document.xml", doc_xml)
        zf.writestr("word/styles.xml", styles_xml)
        zf.writestr("docProps/core.xml", core_xml)
    return buf.getvalue()


def _col_ref(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def build_xlsx_bytes(sheets: list[tuple[str, list[list]]]) -> bytes:
    """Minimal valid .xlsx from (title, rows) pairs.  Strings become
    inline strings, numbers/bools typed cells, datetimes date-styled
    serials (style index 1 -> numFmtId 22), None cells omitted."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        sheet_els, rel_els, overrides = [], [], []
        for idx, (title, rows) in enumerate(sheets, start=1):
            row_xml = []
            for rn, row in enumerate(rows, start=1):
                cells = []
                for ci, val in enumerate(row):
                    if val is None:
                        continue
                    ref = f"{_col_ref(ci)}{rn}"
                    if isinstance(val, bool):
                        cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
                    elif isinstance(val, datetime):
                        serial = (val - _EXCEL_EPOCH).total_seconds() / 86400.0
                        cells.append(f'<c r="{ref}" s="1"><v>{serial!r}</v></c>')
                    elif isinstance(val, (int, float)):
                        cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
                    else:
                        cells.append(
                            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                            f"{_esc(val)}</t></is></c>"
                        )
                row_xml.append(f'<row r="{rn}">{"".join(cells)}</row>')
            sheet_xml = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{''.join(row_xml)}</sheetData></worksheet>"
            )
            zf.writestr(f"xl/worksheets/sheet{idx}.xml", sheet_xml)
            sheet_els.append(
                f'<sheet name="{_esc(title)}" sheetId="{idx}" r:id="rId{idx}"/>'
            )
            rel_els.append(
                f'<Relationship Id="rId{idx}" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
                f'Target="worksheets/sheet{idx}.xml"/>'
            )
            overrides.append(
                f'<Override PartName="/xl/worksheets/sheet{idx}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            )
        wb_xml = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{''.join(sheet_els)}</sheets></workbook>"
        )
        styles_xml = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>'
            "</styleSheet>"
        )
        zf.writestr(
            "[Content_Types].xml",
            _CT_XML.format(
                overrides='<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
                '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
                + "".join(overrides)
            ),
        )
        zf.writestr(
            "_rels/.rels",
            _RELS_XML.format(
                rels='<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            ),
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            _RELS_XML.format(
                rels="".join(rel_els)
                + '<Relationship Id="rIdS" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
            ),
        )
        zf.writestr("xl/workbook.xml", wb_xml)
        zf.writestr("xl/styles.xml", styles_xml)
    return buf.getvalue()


# --- PPTX (C4 — engine extension: the reference DECLARES FileType.PPTX
# [models/file_conversion_models.py:10] but ships its converter commented
# out [converter_factory.py:37], so this closes the declared enum) --------

_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


def decode_pptx_bytes(data: bytes) -> list[list[tuple]]:
    """PPTX bytes -> per-slide ordered event lists.

    Events, in spTree (document) order:
    ``("title", text)`` — non-empty paragraph of a title/ctrTitle
    placeholder shape; ``("para", text, bullet, level)`` — body
    paragraph (bullet = a:buChar/a:buAutoNum present, level = a:pPr
    @lvl, default 0); ``("tbl", rows)`` — a:tbl in a graphicFrame, cell
    text = runs joined with '' then cells joined per row.

    Slides order by their numeric index (ppt/slides/slideN.xml)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = sorted(
        (n for n in zf.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(re.search(r"slide(\d+)\.xml", n).group(1)),
    )
    slides: list[list[tuple]] = []
    for name in names:
        root = ET.fromstring(zf.read(name))
        sptree = root.find(f"{_P}cSld/{_P}spTree")
        events: list[tuple] = []
        if sptree is None:
            slides.append(events)
            continue
        for child in sptree:
            if child.tag == f"{_P}sp":
                is_title = any(
                    ph.get("type") in ("title", "ctrTitle")
                    for ph in child.iter(f"{_P}ph")
                )
                for p in child.iter(f"{_A}p"):
                    text = "".join(t.text or "" for t in p.iter(f"{_A}t"))
                    if not text.strip():
                        continue
                    if is_title:
                        events.append(("title", text))
                    else:
                        ppr = p.find(f"{_A}pPr")
                        lvl = int(ppr.get("lvl", "0")) if ppr is not None else 0
                        bullet = ppr is not None and (
                            ppr.find(f"{_A}buChar") is not None
                            or ppr.find(f"{_A}buAutoNum") is not None
                        )
                        events.append(("para", text, bullet, lvl))
            elif child.tag == f"{_P}graphicFrame":
                for tbl in child.iter(f"{_A}tbl"):
                    rows = []
                    for tr in tbl.findall(f"{_A}tr"):
                        rows.append(
                            [
                                "".join(t.text or "" for t in tc.iter(f"{_A}t"))
                                for tc in tr.findall(f"{_A}tc")
                            ]
                        )
                    events.append(("tbl", rows))
    # deliberate: other shape kinds (pictures, charts) are skipped — the
    # text layer is the training-data payload
        slides.append(events)
    return slides


def build_pptx_bytes(slides: list[dict]) -> bytes:
    """Minimal deterministic PPTX writer for tests/oracles.  Each slide
    dict: {"title": str|None, "paras": [(text, bullet:bool, level:int)],
    "table": [[cell,...],...]|None}."""
    pn = "http://schemas.openxmlformats.org/presentationml/2006/main"
    an = "http://schemas.openxmlformats.org/drawingml/2006/main"
    rn = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    def slide_xml(s: dict) -> str:
        shapes = []
        if s.get("title"):
            shapes.append(
                "<p:sp><p:nvSpPr><p:cNvPr id=\"2\" name=\"Title\"/><p:cNvSpPr/>"
                "<p:nvPr><p:ph type=\"title\"/></p:nvPr></p:nvSpPr><p:spPr/>"
                f"<p:txBody><a:bodyPr/><a:p><a:r><a:t>{_esc(s['title'])}</a:t>"
                "</a:r></a:p></p:txBody></p:sp>"
            )
        paras = s.get("paras") or []
        if paras:
            body = []
            for text, bullet, lvl in paras:
                bu = "<a:buChar char=\"•\"/>" if bullet else "<a:buNone/>"
                body.append(
                    f"<a:p><a:pPr lvl=\"{int(lvl)}\">{bu}</a:pPr>"
                    f"<a:r><a:t>{_esc(text)}</a:t></a:r></a:p>"
                )
            shapes.append(
                "<p:sp><p:nvSpPr><p:cNvPr id=\"3\" name=\"Body\"/><p:cNvSpPr/>"
                "<p:nvPr><p:ph type=\"body\"/></p:nvPr></p:nvSpPr><p:spPr/>"
                f"<p:txBody><a:bodyPr/>{''.join(body)}</p:txBody></p:sp>"
            )
        if s.get("table"):
            trs = []
            for row in s["table"]:
                tcs = "".join(
                    f"<a:tc><a:txBody><a:bodyPr/><a:p><a:r><a:t>{_esc(str(c))}"
                    "</a:t></a:r></a:p></a:txBody></a:tc>"
                    for c in row
                )
                trs.append(f"<a:tr h=\"370840\">{tcs}</a:tr>")
            shapes.append(
                "<p:graphicFrame><p:nvGraphicFramePr>"
                "<p:cNvPr id=\"4\" name=\"Table\"/><p:cNvGraphicFramePr/>"
                "<p:nvPr/></p:nvGraphicFramePr>"
                "<p:xfrm><a:off x=\"0\" y=\"0\"/><a:ext cx=\"1\" cy=\"1\"/></p:xfrm>"
                f"<a:graphic><a:graphicData uri=\"http://schemas.openxmlformats.org/drawingml/2006/table\">"
                f"<a:tbl>{''.join(trs)}</a:tbl></a:graphicData></a:graphic>"
                "</p:graphicFrame>"
            )
        return (
            "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
            f"<p:sld xmlns:p=\"{pn}\" xmlns:a=\"{an}\" xmlns:r=\"{rn}\">"
            f"<p:cSld><p:spTree><p:nvGrpSpPr><p:cNvPr id=\"1\" name=\"\"/>"
            "<p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr><p:grpSpPr/>"
            f"{''.join(shapes)}</p:spTree></p:cSld></p:sld>"
        )

    n = len(slides)
    ct_overrides = "".join(
        f"<Override PartName=\"/ppt/slides/slide{i + 1}.xml\" "
        "ContentType=\"application/vnd.openxmlformats-officedocument."
        "presentationml.slide+xml\"/>"
        for i in range(n)
    )
    content_types = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">"
        "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>"
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>"
        "<Override PartName=\"/ppt/presentation.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml\"/>"
        f"{ct_overrides}</Types>"
    )
    root_rels = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">"
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"ppt/presentation.xml\"/>"
        "</Relationships>"
    )
    sld_ids = "".join(
        f"<p:sldId id=\"{256 + i}\" r:id=\"rId{i + 1}\"/>" for i in range(n)
    )
    presentation = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        f"<p:presentation xmlns:p=\"{pn}\" xmlns:r=\"{rn}\">"
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>"
    )
    pres_rels = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">"
        + "".join(
            f"<Relationship Id=\"rId{i + 1}\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide\" Target=\"slides/slide{i + 1}.xml\"/>"
            for i in range(n)
        )
        + "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("ppt/presentation.xml", presentation)
        zf.writestr("ppt/_rels/presentation.xml.rels", pres_rels)
        for i, s in enumerate(slides):
            zf.writestr(f"ppt/slides/slide{i + 1}.xml", slide_xml(s))
    return buf.getvalue()
