"""Minimal stdlib PDF text extraction (C1, SURVEY.md §2.9).

The reference's PDF path (services/converters/converters/
pdf_converter.py:23-121) extracts each page's text layer with PyPDF2 and
then classifies lines; this module covers the byte->text-layer step for
the common case — uncompressed or FlateDecode content streams with
literal/hex string text operators — using only ``re`` + ``zlib``, so the
C1 pipeline runs end-to-end without PyPDF2.

``decode_pdf_bytes`` parses the object graph (catalog -> page tree ->
per-page contents), decompresses streams, and evaluates the text
operators Tj / TJ / ' / " with Td/TD/T* treated as line breaks — the same
line model PyPDF2's ``extract_text`` produces for simple documents.
``build_pdf_bytes`` writes a deterministic single-font Flate PDF for the
roundtrip tests; no fixture files, no libraries.

Out of scope (documented, raise-free): non-Flate filters (DCT, LZW,
CCITT) yield an empty page; CID/Type0 composite-font text (2-byte
strings) decodes as raw bytes; positioning is ignored beyond the
line-break operators.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\n?endstream", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)}


def _dict_part(body: bytes) -> bytes:
    """The object's dictionary (before any stream keyword)."""
    i = body.find(b"stream")
    return body[:i] if i >= 0 else body


def _ref_value(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _ref_list(body: bytes, key: bytes) -> list[int]:
    """Value of /key as refs: a single ref or an array of refs."""
    single = _ref_value(body, key)
    m = re.search(re.escape(key) + rb"\s*\[(.*?)\]", body, re.S)
    if m:
        return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    return [single] if single is not None else []


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in reading order via the catalog's page tree;
    falls back to /Type /Page objects in object-number order."""
    root = None
    for num, body in objs.items():
        if re.search(rb"/Type\s*/Catalog\b", _dict_part(body)):
            root = _ref_value(_dict_part(body), b"/Pages")
            break
    pages: list[int] = []

    def walk(num: int, seen: set[int]) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = _dict_part(objs[num])
        if re.search(rb"/Type\s*/Page\b(?!s)", body):
            pages.append(num)
        else:
            for kid in _ref_list(body, b"/Kids"):
                walk(kid, seen)

    if root is not None:
        walk(root, set())
    if not pages:
        pages = sorted(
            n for n, b in objs.items()
            if re.search(rb"/Type\s*/Page\b(?!s)", _dict_part(b))
        )
    return pages


def _stream_data(body: bytes) -> bytes:
    m = _STREAM_RE.search(body)
    if not m:
        return b""
    raw = m.group(1)
    filt = re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", _dict_part(body))
    if filt is None:
        return raw
    if filt.group(1) == b"FlateDecode":
        try:
            return zlib.decompress(raw)
        except zlib.error:
            # some writers pad the stream; retry trimmed to /Length
            ln = re.search(rb"/Length\s+(\d+)\b", _dict_part(body))
            if ln:
                try:
                    return zlib.decompress(raw[: int(ln.group(1))])
                except zlib.error:
                    return b""
            return b""
    return b""  # unsupported filter: empty text layer (documented)


def _literal_string(s: bytes, i: int) -> tuple[bytes, int]:
    """Parse a (...) literal starting at the '('; returns (bytes, next i)."""
    out = bytearray()
    depth = 1
    i += 1
    while i < len(s) and depth:
        c = s[i:i + 1]
        if c == b"\\":
            nxt = s[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # octal \ddd
                j = i + 1
                oct_digits = b""
                while j < len(s) and len(oct_digits) < 3 and s[j:j + 1].isdigit():
                    oct_digits += s[j:j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            else:
                i += 2  # line continuation / unknown escape: drop
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _decode_pdf_text(b: bytes) -> str:
    return b.decode("utf-8", errors="replace")


def _extract_page_text(content: bytes) -> str:
    """Evaluate the text operators of one content stream into lines."""
    lines: list[str] = []
    cur: list[str] = []
    i = 0
    n = len(content)
    stack: list[bytes] = []  # operand strings pending an operator

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()
        elif lines and lines[-1] != "":
            lines.append("")

    while i < n:
        c = content[i:i + 1]
        if c == b"(":
            s, i = _literal_string(content, i)
            stack.append(s)
            continue
        if c == b"<" and content[i + 1:i + 2] != b"<":
            j = content.find(b">", i)
            if j < 0:
                break
            hx = re.sub(rb"\s", b"", content[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            stack.append(bytes.fromhex(hx.decode("ascii", "ignore")))
            i = j + 1
            continue
        m = re.match(rb"[A-Za-z'\"*]+", content[i:i + 8])
        if m:
            op = m.group(0)
            if op == b"Tj":
                if stack:
                    cur.append(_decode_pdf_text(stack[-1]))
                stack.clear()
            elif op == b"TJ":
                # array form: every pushed string in order, kerning ignored
                cur.extend(_decode_pdf_text(s) for s in stack)
                stack.clear()
            elif op == b"'":
                newline()
                if stack:
                    cur.append(_decode_pdf_text(stack[-1]))
                stack.clear()
            elif op == b'"':
                newline()
                if stack:
                    cur.append(_decode_pdf_text(stack[-1]))
                stack.clear()
            elif op in (b"Td", b"TD", b"T*"):
                newline()
                stack.clear()
            elif op in (b"BT", b"ET"):
                stack.clear()
            i += len(op)
            continue
        i += 1
    newline()
    # trim the leading break Td emits before the first line
    while lines and lines[0] == "":
        lines.pop(0)
    while lines and lines[-1] == "":
        lines.pop()
    return "\n".join(lines)


def decode_pdf_bytes(data: bytes) -> list[str]:
    """PDF bytes -> one extracted text string per page (PyPDF2
    ``extract_text`` analogue for simple documents)."""
    objs = _objects(data)
    pages: list[str] = []
    for pnum in _page_order(objs):
        parts: list[bytes] = []
        for cref in _ref_list(_dict_part(objs[pnum]), b"/Contents"):
            if cref in objs:
                parts.append(_stream_data(objs[cref]))
        pages.append(_extract_page_text(b"\n".join(parts)))
    return pages


# --- deterministic writer (tests / oracle fixtures) ---------------------------


def _pdf_escape(line: str) -> bytes:
    b = line.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def build_pdf_bytes(pages: list[str], compress: bool = True) -> bytes:
    """Minimal valid PDF: one Flate (or raw) content stream per page,
    each input line a Td/Tj pair — the inverse of decode_pdf_bytes for
    roundtrip tests."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # object number

    page_count = len(pages)
    # fixed layout: 1=catalog, 2=pages, 3=font, then (page, content) pairs
    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(page_count))
    add(f"<< /Type /Pages /Kids [{kids}] /Count {page_count} >>".encode())
    add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, text in enumerate(pages):
        content = bytearray(b"BT /F1 11 Tf 50 780 Td\n")
        for line in text.split("\n"):
            content += b"(" + _pdf_escape(line) + b") Tj 0 -14 Td\n"
        content += b"ET"
        raw = bytes(content)
        if compress:
            raw = zlib.compress(raw)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        cnum = 5 + 2 * i
        add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            + f"/Contents {cnum} 0 R >>".encode()
        )
        add(
            b"<< " + filt + f"/Length {len(raw)} >>".encode()
            + b"\nstream\n" + raw + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
