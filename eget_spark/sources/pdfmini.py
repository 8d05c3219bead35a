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

Modern (PDF 1.5+) files are supported (round-3 verdict item #2): object
location follows the ``startxref`` chain through BOTH classic ``xref``
tables and cross-reference *streams* (``/Type /XRef`` with ``/W`` field
widths, ``/Index`` subsections, FlateDecode + PNG ``/Predictor``
row filters), including hybrid files (``/XRefStm`` in a classic
trailer) and incremental updates (``/Prev`` chain, newest section
wins).  Compressed object streams (``/Type /ObjStm``) are inflated and
their embedded objects indexed via the ``/N``/``/First`` header pair —
the layout most real-world writers emit, which the reference reads via
PyPDF2 (services/converters/converters/pdf_converter.py:23-121).  The
legacy whole-file regex scan remains as a fallback for files with a
damaged or absent xref, but xref-located objects take precedence (the
regex can truncate at ``endobj`` byte sequences inside binary streams).

Round-5 additions: ``LZWDecode`` streams decode via a stdlib LZW
implementation (spec 7.4.4, /EarlyChange honored), and CID/Type0
composite-font text decodes through the font's embedded ``/ToUnicode``
CMap (codespacerange + bfchar + both bfrange forms; 2-byte Identity-H
and 1-byte simple fonts) with per-page /Font resource resolution and
/Parent inheritance — the path the reference gets from PyPDF2
(pdf_converter.py:105-121) for non-Latin and professionally-typeset
documents.

Out of scope (documented, raise-free): image codecs as content filters
(DCT, CCITT, JBIG2, JPX) yield an empty page; Type0 text WITHOUT a
/ToUnicode CMap (raw CID-keyed fonts needing the font program's CMap)
decodes as raw bytes; positioning is ignored beyond the line-break
operators; an indirect ``/Length`` falls back to an ``endstream`` byte
search; TIFF ``/Predictor 2`` is not applied.
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


def _png_unpredict(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    """Undo PNG row predictors (/Predictor >= 10) on a decoded stream —
    xref streams are near-universally written with Up (12); all five PNG
    filter types are reversed for completeness.  Rows here are a handful
    of bytes, so the scalar loop is not a hot path."""
    bpp = max(1, (colors * bpc) // 8)
    row_bytes = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytes(row_bytes)
    i = 0
    while i < len(data):
        f = data[i]
        row = bytearray(data[i + 1 : i + 1 + row_bytes])
        i += 1 + row_bytes
        for x in range(len(row)):
            a = row[x - bpp] if x >= bpp else 0  # reconstructed left
            b = prev[x] if x < len(prev) else 0
            c = prev[x - bpp] if x >= bpp else 0
            if f == 1:  # Sub
                row[x] = (row[x] + a) & 0xFF
            elif f == 2:  # Up
                row[x] = (row[x] + b) & 0xFF
            elif f == 3:  # Average
                row[x] = (row[x] + ((a + b) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        out += row
        prev = bytes(row)
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF ``LZWDecode`` (spec 7.4.4): TIFF-convention LZW — MSB-first
    bit packing, 9..12-bit variable code width, clear=256, EOD=257,
    ``/EarlyChange`` (default 1) widening one entry before the table
    fills.  The reference reads these via PyPDF2
    (services/converters/converters/pdf_converter.py:105-121)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (buf >> nbits) & ((1 << width) - 1)
            if code == 256:  # clear table
                del table[258:]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return bytes(out)  # corrupt stream: keep what decoded
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return bytes(out)  # corrupt stream
            out += entry
            prev = entry
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Fixture-side inverse of ``_lzw_decode`` (EarlyChange=1): generates
    the code sequence with a standard encoder table, then packs bit
    widths by SIMULATING the decoder's width schedule — correct for any
    conforming decoder by construction.  Used by ``build_pdf_bytes`` to
    synthesize LZW test fixtures; never on a hot path."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    codes: list[int] = [256]  # leading clear, as real writers emit
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
        else:
            codes.append(table[w])
            if nxt < 4096:
                table[wc] = nxt
                nxt += 1
            w = c
    if w:
        codes.append(table[w])
    codes.append(257)
    # pack: width at each position = what the decoder will expect
    out = bytearray()
    buf = 0
    nbits = 0
    width = 9
    dictlen = 258
    prev_seen = False
    for code in codes:
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
        if code == 256:
            width, dictlen, prev_seen = 9, 258, False
            continue
        if code == 257:
            break
        if prev_seen and dictlen < 4096:
            dictlen += 1
        prev_seen = True
        if dictlen + 1 >= (1 << width) and width < 12:
            width += 1
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _int_value(d: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\b", d)
    return int(m.group(1)) if m else None


def _int_array(d: bytes, key: bytes) -> list[int]:
    m = re.search(re.escape(key) + rb"\s*\[([^\]]*)\]", d)
    return [int(x) for x in re.findall(rb"[-\d]+", m.group(1))] if m else []


def _apply_filters(dict_part: bytes, raw: bytes) -> bytes:
    """Decode a stream body per its dictionary: FlateDecode, then any PNG
    /Predictor from /DecodeParms.  Unsupported filters -> b'' (documented)."""
    filt = re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", dict_part)
    if filt is not None:
        if filt.group(1) == b"FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                # some writers pad the stream; retry trimmed to /Length
                ln = _int_value(dict_part, b"/Length")
                if ln is None:
                    return b""
                try:
                    raw = zlib.decompress(raw[:ln])
                except zlib.error:
                    return b""
        elif filt.group(1) == b"LZWDecode":
            parms0 = re.search(rb"/DecodeParms\s*<<(.*?)>>", dict_part, re.S)
            early = 1
            if parms0:
                e = re.search(rb"/EarlyChange\s+([01])\b", parms0.group(1))
                if e:
                    early = int(e.group(1))
            raw = _lzw_decode(raw, early)
        else:
            return b""  # unsupported filter: empty text layer (documented)
    parms = re.search(rb"/DecodeParms\s*<<(.*?)>>", dict_part, re.S)
    if parms:
        pred = _int_value(parms.group(1), b"/Predictor") or 1
        if pred >= 10:
            cols = _int_value(parms.group(1), b"/Columns") or 1
            colors = _int_value(parms.group(1), b"/Colors") or 1
            bpc = _int_value(parms.group(1), b"/BitsPerComponent") or 8
            raw = _png_unpredict(raw, cols, colors, bpc)
    return raw


def _stream_data(body: bytes) -> bytes:
    m = _STREAM_RE.search(body)
    if not m:
        return b""
    return _apply_filters(_dict_part(body), m.group(1))


# --- xref-driven object location (PDF 1.5+ support) ---------------------------

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _dict_span(data: bytes, i: int) -> int:
    """End index (exclusive) of the ``<< ... >>`` dictionary starting at
    ``i``; handles nesting.  Returns ``i`` if no dictionary starts there."""
    if data[i : i + 2] != b"<<":
        return i
    depth = 0
    j = i
    n = len(data)
    while j < n:
        if data[j : j + 2] == b"<<":
            depth += 1
            j += 2
        elif data[j : j + 2] == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return j
        elif data[j : j + 1] == b"(":
            _, j = _literal_string(data, j)
        else:
            j += 1
    return j


def _obj_at(data: bytes, off: int) -> tuple[int, bytes] | None:
    """Parse the indirect object starting at file offset ``off`` into
    (object number, body bytes) with the same body shape the regex scan
    yields (dict [+ stream...endstream]).  Stream extent comes from a
    direct /Length when present — binary data containing ``endobj`` can
    no longer truncate the object — else an ``endstream`` search."""
    while off < len(data) and data[off : off + 1] in b" \t\r\n":
        off += 1
    m = _OBJ_HEAD_RE.match(data, off)
    if m is None:
        return None
    start = m.end()
    i = start
    while i < len(data) and data[i : i + 1] in b" \t\r\n":
        i += 1
    dict_end = _dict_span(data, i)
    j = dict_end
    while j < len(data) and data[j : j + 1] in b" \t\r\n":
        j += 1
    if data[j : j + 6] == b"stream":
        k = j + 6
        if data[k : k + 2] == b"\r\n":
            k += 2
        elif data[k : k + 1] == b"\n":
            k += 1
        ln = _int_value(data[i:dict_end], b"/Length")
        if ln is not None and data[k + ln : k + ln + 16].lstrip().startswith(
            b"endstream"
        ):
            send = k + ln
        else:  # indirect or wrong /Length: byte search (documented)
            send = data.find(b"endstream", k)
            if send < 0:
                return None
        end = data.find(b"endobj", send)
    else:
        end = data.find(b"endobj", dict_end)
    if end < 0:
        end = len(data)
    return int(m.group(1)), data[start:end]


def _parse_xref_table(data: bytes, off: int) -> tuple[dict[int, int], bytes]:
    """Classic ``xref`` section at ``off`` -> ({objnum: offset}, trailer
    dict bytes)."""
    entries: dict[int, int] = {}
    i = data.find(b"xref", off) + 4
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*", data[i : i + 64])
        if m is None:
            break
        first, count = int(m.group(1)), int(m.group(2))
        i += m.end()
        for k in range(count):
            # entries are SPEC'd as exactly 20 bytes, but some real-world
            # writers emit 19 (lone \n terminator) — advance by the
            # matched length, not a fixed stride, so a 19-byte entry
            # doesn't misalign every entry after it
            e = re.match(rb"(\d{10})\s(\d{5})\s([nf])\s{0,2}", data[i : i + 20])
            if e is None:
                break
            if e.group(3) == b"n":
                entries.setdefault(first + k, int(e.group(1)))
            i += e.end()
    t = data.find(b"trailer", i)
    if t < 0:
        return entries, b""
    d = t + 7
    while d < len(data) and data[d : d + 1] in b" \t\r\n":
        d += 1
    return entries, data[d : _dict_span(data, d)]


def _parse_xref_stream(
    data: bytes, off: int, offsets: dict[int, int]
) -> int | None:
    """Cross-reference STREAM object at ``off`` (PDF 1.5+): decode the
    /W-packed entry table into ``offsets`` (type-1 only — type-2 members
    surface via ObjStm expansion).  Returns /Prev or None."""
    parsed = _obj_at(data, off)
    if parsed is None:
        return None
    body = parsed[1]
    d = _dict_part(body)
    if not re.search(rb"/Type\s*/XRef\b", d):
        return None
    w = _int_array(d, b"/W")
    size = _int_value(d, b"/Size") or 0
    if not w or len(w) < 2:
        return None
    index = _int_array(d, b"/Index") or [0, size]
    content = _stream_data(body)
    ew = sum(w)
    pos = 0
    for s in range(0, len(index) - 1, 2):
        start, count = index[s], index[s + 1]
        for k in range(count):
            if pos + ew > len(content):
                break
            fields = []
            for width in w:
                fields.append(int.from_bytes(content[pos : pos + width], "big"))
                pos += width
            typ = fields[0] if w[0] else 1
            if typ == 1:
                offsets.setdefault(start + k, fields[1])
    return _int_value(d, b"/Prev")


def _objects_via_xref(data: bytes) -> dict[int, bytes]:
    """Locate objects through the startxref chain (tables, xref streams,
    hybrid /XRefStm, incremental /Prev updates — newest section wins)."""
    last = None
    for last in re.finditer(rb"startxref\s+(\d+)", data):
        pass
    if last is None:
        return {}
    offsets: dict[int, int] = {}
    queue = [int(last.group(1))]
    visited: set[int] = set()
    while queue:
        off = queue.pop(0)  # FIFO: newest sections claim entries first
        if off in visited or not (0 <= off < len(data)):
            continue
        visited.add(off)
        if data[off : off + 24].lstrip().startswith(b"xref"):
            entries, trailer = _parse_xref_table(data, off)
            for num, o in entries.items():
                offsets.setdefault(num, o)
            # hybrid files: /XRefStm (compressed members) before older /Prev
            for key in (b"/XRefStm", b"/Prev"):
                v = _int_value(trailer, key)
                if v is not None:
                    queue.append(v)
        else:
            prev = _parse_xref_stream(data, off, offsets)
            if prev is not None:
                queue.append(prev)
    objs: dict[int, bytes] = {}
    for num, o in offsets.items():
        parsed = _obj_at(data, o)
        if parsed is not None and parsed[0] == num:
            objs[num] = parsed[1]
    return objs


def _expand_objstms(objs: dict[int, bytes]) -> None:
    """Inflate every /Type /ObjStm container in ``objs`` and add its
    embedded objects (header = /N pairs of ``objnum offset`` before
    /First; members are dict/array objects without obj..endobj
    wrappers).  Directly-defined objects keep precedence."""
    for num in list(objs):
        body = objs[num]
        d = _dict_part(body)
        if not re.search(rb"/Type\s*/ObjStm\b", d):
            continue
        data = _stream_data(body)
        first = _int_value(d, b"/First")
        n = _int_value(d, b"/N")
        if not data or first is None or n is None:
            continue
        nums = [int(x) for x in re.findall(rb"\d+", data[:first])]
        pairs = list(zip(nums[0::2], nums[1::2]))[:n]
        for k, (onum, ooff) in enumerate(pairs):
            end = first + pairs[k + 1][1] if k + 1 < len(pairs) else len(data)
            objs.setdefault(onum, data[first + ooff : end].strip())


# --- CID/Type0 composite fonts: /ToUnicode CMap decode ------------------------

_HEX_ITEM_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _hex_to_uni(h: bytes) -> str:
    """Destination hex of a bfchar/bfrange -> Unicode (UTF-16BE code
    units, surrogate pairs included)."""
    if len(h) % 4:  # pad odd-length writers emit for 1-byte dsts
        h = h.rjust((len(h) + 3) // 4 * 4, b"0")
    return bytes.fromhex(h.decode("ascii", "ignore")).decode(
        "utf-16-be", errors="replace"
    )


def _parse_tounicode(cmap: bytes) -> tuple[dict[int, str], int]:
    """Parse a /ToUnicode CMap stream: ``begincodespacerange`` (source
    code byte length), ``beginbfchar`` pairs, and ``beginbfrange``
    triples in both the incrementing-destination and array forms.
    Returns (code -> unicode string, code length in bytes)."""
    m2u: dict[int, str] = {}
    code_len = 0
    for m in re.finditer(rb"begincodespacerange(.*?)endcodespacerange", cmap, re.S):
        for h in _HEX_ITEM_RE.finditer(m.group(1)):
            code_len = max(code_len, len(h.group(1)) // 2)
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for pair in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            m2u[int(pair.group(1), 16)] = _hex_to_uni(pair.group(2))
            code_len = max(code_len, len(pair.group(1)) // 2)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        for r in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
            m.group(1),
        ):
            lo, hi = int(r.group(1), 16), int(r.group(2), 16)
            code_len = max(code_len, len(r.group(1)) // 2)
            dst = r.group(3)
            if dst.startswith(b"["):  # explicit per-code destinations
                for k, d in enumerate(_HEX_ITEM_RE.findall(dst)):
                    if lo + k > hi:
                        break
                    m2u[lo + k] = _hex_to_uni(d)
            else:  # incrementing form: the LAST BYTE of dst increments
                hexs = dst[1:-1]
                hexs = hexs.rjust((len(hexs) + 3) // 4 * 4, b"0")
                base = bytearray.fromhex(hexs.decode("ascii"))
                for k in range(hi - lo + 1):
                    b2 = bytearray(base)
                    b2[-1] = (base[-1] + k) & 0xFF
                    m2u[lo + k] = bytes(b2).decode("utf-16-be", errors="replace")
    return m2u, (code_len or 2)


def _cmap_decoder(m2u: dict[int, str], code_len: int):
    """String-bytes -> text through a ToUnicode map; unmapped codes
    become U+FFFD (PyPDF2 leaves them out; a visible replacement is the
    more debuggable contract for a corpus pipeline)."""

    def dec(b: bytes) -> str:
        return "".join(
            m2u.get(int.from_bytes(b[i : i + code_len], "big"), "�")
            for i in range(0, len(b) - code_len + 1, code_len)
        )

    return dec


def _resolve_dict(objs: dict[int, bytes], body: bytes, key: bytes) -> bytes:
    """Value of /key as dictionary bytes — inline ``<< ... >>`` or an
    indirect reference."""
    m = re.search(re.escape(key) + rb"\s*<<", body)
    if m:
        start = m.end() - 2
        return body[start : _dict_span(body, start)]
    ref = _ref_value(body, key)
    if ref is not None and ref in objs:
        return _dict_part(objs[ref])
    return b""


def _page_fonts(objs: dict[int, bytes], page_num: int) -> dict:
    """Font-name -> decoder map for one page: every /Font resource entry
    carrying a /ToUnicode CMap gets a CMap decoder (2-byte Identity-H
    Type0 fonts and 1-byte simple fonts alike); fonts without one fall
    back to the default byte decode.  /Resources inherits through
    /Parent, as the page-tree spec allows."""
    body = _dict_part(objs[page_num])
    res = b""
    for _ in range(8):  # bounded /Parent walk
        res = _resolve_dict(objs, body, b"/Resources")
        if res:
            break
        parent = _ref_value(body, b"/Parent")
        if parent is None or parent not in objs:
            break
        body = _dict_part(objs[parent])
    if not res:
        return {}
    fonts: dict[str, object] = {}
    fdict = _resolve_dict(objs, res, b"/Font")
    for m in re.finditer(rb"/([A-Za-z0-9_.+-]+)\s+(\d+)\s+\d+\s+R", fdict):
        fobj = objs.get(int(m.group(2)))
        if fobj is None:
            continue
        tu = _ref_value(_dict_part(fobj), b"/ToUnicode")
        if tu is None or tu not in objs:
            continue
        cmap = _stream_data(objs[tu])
        if not cmap:
            continue
        m2u, code_len = _parse_tounicode(cmap)
        if m2u:
            fonts[m.group(1).decode("ascii", "ignore")] = _cmap_decoder(
                m2u, code_len
            )
    return fonts


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


def _extract_page_text(content: bytes, fonts: dict | None = None) -> str:
    """Evaluate the text operators of one content stream into lines.
    ``fonts`` maps resource font names (the /F1 of ``/F1 12 Tf``) to
    string decoders — CID/Type0 fonts with a /ToUnicode CMap decode
    2-byte codes to Unicode; everything else takes the default byte
    decode.  The selected font persists across BT/ET (text state is not
    reset by the spec)."""
    lines: list[str] = []
    cur: list[str] = []
    i = 0
    n = len(content)
    stack: list[bytes] = []  # operand strings pending an operator
    decode = _decode_pdf_text
    last_name = ""

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
        if c == b"/":
            m = re.match(rb"/([A-Za-z0-9_.+-]+)", content[i : i + 64])
            if m:
                last_name = m.group(1).decode("ascii", "ignore")
                i += m.end()
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
                    cur.append(decode(stack[-1]))
                stack.clear()
            elif op == b"TJ":
                # array form: every pushed string in order, kerning ignored
                cur.extend(decode(s) for s in stack)
                stack.clear()
            elif op == b"'":
                newline()
                if stack:
                    cur.append(decode(stack[-1]))
                stack.clear()
            elif op == b'"':
                newline()
                if stack:
                    cur.append(decode(stack[-1]))
                stack.clear()
            elif op == b"Tf":
                decode = (fonts or {}).get(last_name, _decode_pdf_text)
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
    ``extract_text`` analogue).  Objects are located via the startxref
    chain when one exists (exact stream extents, xref streams, ObjStm
    members); the whole-file regex scan backfills anything the xref
    missed (damaged or absent tables)."""
    objs = _objects(data)
    objs.update(_objects_via_xref(data))  # xref-located bodies are exact
    _expand_objstms(objs)
    pages: list[str] = []
    for pnum in _page_order(objs):
        parts: list[bytes] = []
        for cref in _ref_list(_dict_part(objs[pnum]), b"/Contents"):
            if cref in objs:
                parts.append(_stream_data(objs[cref]))
        pages.append(_extract_page_text(b"\n".join(parts), _page_fonts(objs, pnum)))
    return pages


# --- deterministic writer (tests / oracle fixtures) ---------------------------


def _pdf_escape(line: str) -> bytes:
    b = line.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _page_and_content_objs(pages: list[str], compress: bool):
    """Shared object bodies for both writer modes: returns
    (packed_candidates, content_streams) as (objnum, body) lists using
    the fixed layout 1=catalog, 2=pages, 3=font, then (page, content)
    pairs."""
    page_count = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(page_count))
    packed = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {page_count} >>".encode()),
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    contents = []
    for i, text in enumerate(pages):
        content = bytearray(b"BT /F1 11 Tf 50 780 Td\n")
        for line in text.split("\n"):
            content += b"(" + _pdf_escape(line) + b") Tj 0 -14 Td\n"
        content += b"ET"
        raw = bytes(content)
        filt = b""
        if compress == "lzw":
            raw = _lzw_encode(raw)
            filt = b"/Filter /LZWDecode "
        elif compress:
            raw = zlib.compress(raw)
            filt = b"/Filter /FlateDecode "
        pnum, cnum = 4 + 2 * i, 5 + 2 * i
        packed.append(
            (
                pnum,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> "
                + f"/Contents {cnum} 0 R >>".encode(),
            )
        )
        contents.append(
            (
                cnum,
                b"<< " + filt + f"/Length {len(raw)} >>".encode()
                + b"\nstream\n" + raw + b"\nendstream",
            )
        )
    return packed, contents


def _build_pdf_objstm(pages: list[str]) -> bytes:
    """PDF 1.5 writer: every non-stream object packed into one /ObjStm,
    located by a /Type /XRef cross-reference stream (W=[1 3 2], PNG Up
    predictor) — the modern layout most real-world writers emit, and the
    roundtrip fixture for decode_pdf_bytes' xref-stream/ObjStm path."""
    packed, contents = _page_and_content_objs(pages, compress=True)
    stm_num = 5 + 2 * (len(pages) - 1) + 1 if pages else 4
    xref_num = stm_num + 1
    # ObjStm payload: "num off" header pairs, then the bodies
    segs = [b_ for _, b_ in packed]
    offs, off = [], 0
    for s in segs:
        offs.append(off)
        off += len(s) + 1  # joined with \n
    header = (" ".join(f"{n} {o}" for (n, _), o in zip(packed, offs)) + "\n").encode()
    payload = header + b"\n".join(segs)
    comp = zlib.compress(payload)
    objstm_body = (
        f"<< /Type /ObjStm /N {len(packed)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(comp)} >>".encode()
        + b"\nstream\n" + comp + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for n, body in contents + [(stm_num, objstm_body)]:
        offsets[n] = len(out)
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    size = xref_num + 1
    packed_idx = {n: i for i, (n, _) in enumerate(packed)}
    rows = []
    for n in range(size):
        if n == 0:
            rows.append((0, 0, 65535))
        elif n in offsets:
            rows.append((1, offsets[n], 0))
        elif n == xref_num:
            rows.append((1, xref_off, 0))
        else:
            rows.append((2, stm_num, packed_idx[n]))
    enc = bytearray()
    prev = bytes(6)
    for t, f2, f3 in rows:
        row = bytes([t]) + f2.to_bytes(3, "big") + f3.to_bytes(2, "big")
        enc += bytes([2]) + bytes((row[i] - prev[i]) & 0xFF for i in range(6))
        prev = row
    comp2 = zlib.compress(bytes(enc))
    out += f"{xref_num} 0 obj\n".encode() + (
        f"<< /Type /XRef /Size {size} /W [1 3 2] /Index [0 {size}] "
        f"/Root 1 0 R /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 6 >> "
        f"/Length {len(comp2)} >>".encode()
        + b"\nstream\n" + comp2 + b"\nendstream"
    ) + b"\nendobj\n"
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


def build_pdf_type0_bytes(pages: list[str]) -> bytes:
    """Deterministic PDF with a CID/Type0 (Identity-H) font: page text
    is written as 2-byte hex-string codes assigned per unique character
    (sorted order, code 1 upward) and mapped back via an embedded
    /ToUnicode CMap (codespacerange + bfchar blocks of <=100 entries +
    one bfrange exercising the incrementing form).  The roundtrip
    fixture for the composite-font decode path — the layout
    professionally-typeset and non-Latin PDFs use, which the reference
    reads via PyPDF2 (pdf_converter.py:105-121)."""
    chars = sorted({c for t in pages for c in t if c != "\n"})
    code_of = {c: i + 1 for i, c in enumerate(chars)}
    page_count = len(pages)
    kids = " ".join(f"{5 + 2 * i} 0 R" for i in range(page_count))
    bodies: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {page_count} >>".encode(),
        3: (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/Encoding /Identity-H /ToUnicode 4 0 R >>"
        ),
    }
    # ToUnicode CMap: first (up to) 8 codes via ONE incrementing bfrange
    # per contiguous-destination run, the rest via bfchar blocks
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin begincmap",
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange",
    ]
    items = [(code_of[c], c) for c in chars]
    # incrementing bfrange form is only valid while the LAST BYTE of the
    # destination increments without overflow; emit runs of consecutive
    # codepoints that share their high bytes
    runs: list[list[tuple[int, str]]] = []
    for code, ch in items:
        if (
            runs
            and code == runs[-1][-1][0] + 1
            and ord(ch) == ord(runs[-1][-1][1]) + 1
            and ord(ch) <= 0xFFFF
            and (ord(ch) >> 8) == (ord(runs[-1][-1][1]) >> 8)
        ):
            runs[-1].append((code, ch))
        else:
            runs.append([(code, ch)])
    range_runs = [r for r in runs if len(r) >= 2][:1]  # exercise the form once
    ranged = {code for r in range_runs for code, _ in r}
    for r in range_runs:
        lines.append(b"1 beginbfrange")
        lines.append(
            f"<{r[0][0]:04x}> <{r[-1][0]:04x}> "
            f"<{ord(r[0][1]):04x}>".encode()
        )
        lines.append(b"endbfrange")
    rest = [(code, ch) for code, ch in items if code not in ranged]
    for blk in range(0, len(rest), 100):
        chunk = rest[blk : blk + 100]
        lines.append(f"{len(chunk)} beginbfchar".encode())
        for code, ch in chunk:
            dst = ch.encode("utf-16-be").hex()
            lines.append(f"<{code:04x}> <{dst}>".encode())
        lines.append(b"endbfchar")
    lines += [b"endcmap end end"]
    cmap = b"\n".join(lines)
    comp = zlib.compress(cmap)
    bodies[4] = (
        f"<< /Filter /FlateDecode /Length {len(comp)} >>".encode()
        + b"\nstream\n" + comp + b"\nendstream"
    )
    for i, text in enumerate(pages):
        content = bytearray(b"BT /F1 11 Tf 50 780 Td\n")
        for line in text.split("\n"):
            hx = "".join(f"{code_of[c]:04x}" for c in line)
            content += b"<" + hx.encode() + b"> Tj 0 -14 Td\n"
        content += b"ET"
        raw = zlib.compress(bytes(content))
        pnum, cnum = 5 + 2 * i, 6 + 2 * i
        bodies[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            + f"/Contents {cnum} 0 R >>".encode()
        )
        bodies[cnum] = (
            f"<< /Filter /FlateDecode /Length {len(raw)} >>".encode()
            + b"\nstream\n" + raw + b"\nendstream"
        )
    total = len(bodies)
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num in range(1, total + 1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + bodies[num] + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {total + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {total + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_pdf_bytes(
    pages: list[str], compress: bool | str = True, objstm: bool = False
) -> bytes:
    """Minimal valid PDF: one Flate (or raw) content stream per page,
    each input line a Td/Tj pair — the inverse of decode_pdf_bytes for
    roundtrip tests.  ``objstm=True`` emits the modern PDF 1.5 layout
    (object streams + cross-reference stream) instead of a classic xref
    table."""
    if objstm:
        return _build_pdf_objstm(pages)
    packed, contents = _page_and_content_objs(pages, compress)
    bodies = dict(packed + contents)
    total = len(bodies)
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num in range(1, total + 1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + bodies[num] + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {total + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {total + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
