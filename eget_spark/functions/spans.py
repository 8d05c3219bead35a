"""Span-sequence operators: link harvest (X1) and span->markdown assembly (X7).

The assembly reproduces the reference's DocumentStructure rendering
(/root/reference/services/converters/document_structure.py:67-186) over the
*flattened* span sequence.  The reference stores a heading tree and renders
it depth-first with `'\\n\\n'.join(part.strip())`; the flat offset order IS
that depth-first order (SURVEY.md §1.1), so a single pass with a heading
stack reproduces the exact output, including:

- list indent = 4 spaces x (number of open heading ancestors)
  (document_structure.py:97-106 `indent = "    " * level`)
- table column widths from raw cell text, pipes escaped after padding
  width computation, left-align separator rendered as ``:---``
  (document_structure.py:134-186)
- code fenced with first-line language tag (:119-121), math inline ``$..$``
  (:123-127; spans carry no inline flag — inline form is the engine's
  documented choice), separator ``---`` (:129-130)
- METADATA / FOOTNOTE / CITATION render to nothing (no branch in
  `_process_element` -> returns "" and is dropped by the join-strip)

`link` spans (not a reference ElementType) render as ``[text](target)``.

Implemented as ONE Arrow-vectorized pandas UDF — the table-width loop makes
a pure column-expression form impossible (SURVEY.md §2.8 X7); everything
else about the pipeline stays JVM-side.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ORDERED_RE = re.compile(r"^\d+\.\s")


def _render_table(text: str) -> str:
    rows = [line.split("\t") for line in text.split("\n")]
    if not rows or not rows[0]:
        return ""
    ncols = len(rows[0])
    widths = [0] * ncols
    for row in rows:
        for i, cell in enumerate(row[:ncols]):
            widths[i] = max(widths[i], len(str(cell)))

    def render_row(row: list[str]) -> str:
        cells = []
        for cell, width in zip(row, widths):
            cell_str = str(cell).replace("|", "\\|")
            cells.append(f" {cell_str:<{width}} ")
        return f"|{'|'.join(cells)}|"

    lines = [render_row(rows[0])]
    lines.append("|" + "|".join(f":{'-' * w}" for w in widths) + "|")
    for row in rows[1:]:
        lines.append(render_row(row))
    return "\n".join(lines)


def _render_list(text: str, depth: int) -> str:
    items = text.split("\n")
    indent = "    " * depth
    if items and _ORDERED_RE.match(items[0]):
        stripped = [_ORDERED_RE.sub("", it) for it in items]
        return "\n".join(f"{indent}{i}. {it}" for i, it in enumerate(stripped, 1))
    return "\n".join(f"{indent}- {it}" for it in items)


def render_spans(spans: list) -> str:
    """Pure-Python kernel: one doc's ordered spans -> markdown."""
    parts: list[str] = []
    stack: list[int] = []  # open heading levels
    for s in sorted(spans, key=lambda x: x["offset"]):
        kind = s["kind"]
        text = s["text"] or ""
        ref = s["media_ref"] or ""
        if kind == "heading":
            m = re.match(r"^(#{1,6})\s*", text)
            level = len(m.group(1)) if m else 1
            while stack and stack[-1] >= level:
                stack.pop()
            content = text[m.end():] if m else text
            parts.append(f"{'#' * level} {content}")
            stack.append(level)
            continue
        depth = len(stack)
        if kind == "paragraph":
            parts.append(text)
        elif kind == "list":
            parts.append(_render_list(text, depth))
        elif kind == "table":
            parts.append(_render_table(text))
        elif kind == "image":
            parts.append(f"![{text or 'Image'}]({ref})")
        elif kind == "code":
            lang, _, body = text.partition("\n")
            parts.append(f"```{lang}\n{body}\n```")
        elif kind == "math":
            parts.append(f"${text}$")
        elif kind == "separator":
            parts.append("---")
        elif kind == "link":
            parts.append(f"[{text}]({ref})")
        # metadata / footnote / citation -> ""
    return "\n\n".join(p.strip() for p in parts if p.strip())


@F.pandas_udf(T.StringType())
def _assemble_udf(spans: pd.Series) -> pd.Series:
    return pd.Series(
        [render_spans(list(s)) if s is not None else None for s in spans],
        dtype=object,
    )


@F.pandas_udf(T.StringType())
def _assemble_json_udf(spans_json: pd.Series) -> pd.Series:
    import json

    def load(s: str) -> list:
        spans = json.loads(s)
        for sp in spans:  # to_json omits null fields; restore the keys
            sp.setdefault("text", None)
            sp.setdefault("media_ref", None)
            sp.setdefault("offset", 0)
        return spans

    return pd.Series(
        [
            render_spans(load(s)) if s is not None else None
            for s in spans_json
        ],
        dtype=object,
    )


def assemble_markdown(spans: Column) -> Column:
    """X7: spans array -> markdown string (Arrow-batched).

    The span sequence crosses the Python boundary as ONE JSON string per
    document (JVM ``to_json`` + C-accelerated ``json.loads``), not as an
    Arrow array<struct> column: PySpark's Arrow->pandas conversion of
    nested struct arrays builds per-element Python dicts in interpreted
    code and dominated the crawl bench (measured round 6: the 30k-page
    markdown pass carried ~160 s of executor task time of which the
    rendering kernel itself was < 1 s; the JSON detour cuts the pass
    ~4x).  ``to_json`` omits null struct fields, so the kernel reads
    fields with ``.get()`` defaults (guide §4.1-4.2)."""
    return _assemble_json_udf(F.to_json(spans))


def link_targets(spans: Column) -> Column:
    """X1: raw href targets of all `link` spans, in offset order.

    Pure higher-order SQL (zero Python): the corpus-side analogue of the
    BeautifulSoup `<a href>` harvest (link_extractor.py:107-121).
    """
    links = F.filter(spans, lambda s: s["kind"] == F.lit("link"))
    return F.transform(links, lambda s: s["media_ref"])


def link_anchor_pairs(spans: Column) -> Column:
    """X1 companion: (target, anchor) pairs of all `link` spans, in offset
    order — the backlink/anchor-text harvest (anchor text aggregated per
    target is the classic web-corpus relevance signal). Pure higher-order
    SQL, zero Python."""
    links = F.filter(spans, lambda s: s["kind"] == F.lit("link"))
    return F.transform(
        links,
        lambda s: F.struct(
            s["media_ref"].alias("target"), s["text"].alias("anchor")
        ),
    )


def span_kind_counts(spans: Column, kind: str) -> Column:
    """A5: per-doc count of spans of one kind (converter counters,
    pdf_converter.py:50-54 analogue) — higher-order, zero Python."""
    return F.size(F.filter(spans, lambda s: s["kind"] == F.lit(kind)))


def renumber_spans(spans: Column, drop_kinds: tuple[str, ...]) -> Column:
    """Drop spans of the given kinds and RENUMBER offsets 0..n-1.

    The interleaved-doc maintenance op behind every modality projection:
    a text-only training export drops image/video spans, but downstream
    span assembly (X7) and chunk positions (O4) require ``offset`` to be
    the dense 0-based sequence index — so the projection must re-key, not
    just filter.  Pure higher-order SQL (filter + indexed transform),
    per-row array algebra: zero shuffle, zero Python, survives any data
    scale because span arrays are page-bounded.
    """
    kept = F.filter(
        spans, lambda s: ~s["kind"].isin(*drop_kinds)
    )
    return F.transform(
        kept,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
