"""HTML content extraction (X2-X6): clean -> main-content -> markdown ->
post-process, as Arrow-vectorized pandas UDF kernels.

Reference pipeline (services/scraper/scraper.py):
- X2 `_clean_html` (:311-352): drop script/style/iframe/noscript +
  comments; drop nav/footer/header unless they contain main/article/
  section; whitelist attributes {href,src,alt,title,class,id,data-*,role,
  aria-*,type,rel,target}
- X3 `_find_main_content` (:485-505): first of main, article,
  div[id~content|main|article], div[class~...], div[role=main]; fallback =
  largest text container among div/section
- X5 `_convert_to_markdown_with_images` (:507-541): html2text with
  body_width=0, mark_code (emits [code]..[/code]), `*`/`**` emphasis;
  image alt defaulting + title-from-filename enrichment (:517-528)
- X6 `_post_process_markdown` (:543-662): comment strip, &nbsp;/\\xa0,
  header/list fixes, the stateful line-walker (blank-line collapse, spacing
  around headers/lists/images), [code]->``` fence rewrite, `*`-only line
  removal, code-block/image spacing, final strip

BeautifulSoup/html2text are not in this environment; the DOM walk uses a
minimal stdlib-`html.parser` tree. X6 is a faithful reimplementation of the
reference walker; X5 transcribes html2text's emission rules for the
feature set the reference config exercises (body_width=0, mark_code,
`*`/`**` marks, tables kept): headings, emphasis, links, images,
[code]-marks, hr, NESTED lists (two spaces per enclosing list, three for
a ul directly under an ol — the 2024.2.26 alignment rule — with
per-level UNPADDED ol counters matching html2text's own >9 TODO,
sublists on following lines), blockquote continuation
(``> `` per line, ``>`` on blank separator lines, ``>>`` when nested)
and html2text's table shape (``a| b`` rows — later cells ``| ``-prefixed
— with a ``---|---`` underline after the FIRST row only).  The X5+X6
composition is pinned by golden tests incl. adversarial nesting.

Known divergences from html2text itself (library absent, documented not
silent):
- `<br>` inside emphasis/link labels collapses to a space;
- entity references: stdlib html.parser (convert_charrefs=True) merges a
  decoded entity into the surrounding text chunk, so e.g. ``&#45; x`` at
  a chunk start escapes as ``\\- x`` where html2text (entity_char=True
  path) would not escape it;
- reflowing/wrapping differences cannot arise (body_width=0 both sides).
(The former no-metachar-escaping delta is closed: round 5 transcribes
utils.escape_md_section at escape_snob=False — backslash everywhere in
non-code text runs, plus the chunk-^-anchored dot/plus/dash escapes —
see _escape_md_section.)
(The former `<ol>`-past-9 delta is closed: html2text 2024.2.26 emits
unpadded ``N. `` markers — its in-source TODO — and indents a ul under
an ol by three spaces; both rules are now transcribed and golden-pinned.)
"""

from __future__ import annotations

import json as _json
import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOID = {"br", "img", "hr", "meta", "link", "input", "area", "base", "col", "embed", "source", "track", "wbr"}
_DROP = {"script", "style", "iframe", "noscript"}
_MAYBE_DROP = {"nav", "footer", "header"}
_KEEP_IF_INSIDE = {"main", "article", "section"}
_ALLOWED_ATTRS = {"href", "src", "alt", "title", "class", "id", "role", "type", "rel", "target"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent: "Node | None" = None):
        self.tag = tag  # '' = text node, attrs['text'] holds content
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.parent = parent

    def text(self) -> str:
        if self.tag == "":
            return self.attrs.get("text", "")
        return "".join(c.text() for c in self.children)

    def find_all(self, tags: set[str]):
        out = []
        for c in self.children:
            if c.tag in tags:
                out.append(c)
            out.extend(c.find_all(tags))
        return out


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[root]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(
                Node("", {"text": data}, self.stack[-1])
            )


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


def clean_tree(root: Node) -> Node:
    """X2 in-place tree clean (scraper.py:311-352)."""

    def keep(node: Node) -> bool:
        if node.tag in _DROP:
            return False
        if node.tag in _MAYBE_DROP and not node.find_all(_KEEP_IF_INSIDE):
            return False
        return True

    def walk(node: Node) -> None:
        node.children = [c for c in node.children if keep(c)]
        for c in node.children:
            if c.tag:
                c.attrs = {
                    k: v
                    for k, v in c.attrs.items()
                    if k in _ALLOWED_ATTRS or k.startswith("data-") or k.startswith("aria-")
                }
            walk(c)

    walk(root)
    return root


_MAIN_ID_RE = re.compile(r"content|main|article", re.I)


def find_main_content(root: Node) -> Node | None:
    """X3 (scraper.py:485-505), pattern order preserved."""

    def find_first(pred) -> Node | None:
        for n in _iter(root):
            if pred(n):
                return n
        return None

    def _iter(node):
        for c in node.children:
            yield c
            yield from _iter(c)

    for pred in (
        lambda n: n.tag == "main",
        lambda n: n.tag == "article",
        lambda n: n.tag == "div" and _MAIN_ID_RE.search(n.attrs.get("id", "") or ""),
        lambda n: n.tag == "div" and _MAIN_ID_RE.search(n.attrs.get("class", "") or ""),
        lambda n: n.tag == "div" and n.attrs.get("role") == "main",
    ):
        hit = find_first(pred)
        if hit:
            return hit
    containers = [n for n in _iter(root) if n.tag in ("div", "section")]
    if containers:
        return max(containers, key=lambda x: len(x.text()))
    return None


# X4 og:* rename table (scraper.py:373-390); anything else gets
# f"og{prop.capitalize()}" (e.g. og:image:width -> "ogImage:width")
_OG_RENAME = {
    "title": "ogTitle",
    "description": "ogDescription",
    "image": "ogImage",
    "url": "ogUrl",
    "site_name": "ogSiteName",
    "type": "og:type",
    "locale": "ogLocale",
}
_AUTHOR_IMG_RE = re.compile(r"author|writer", re.I)


def extract_meta(root: Node) -> dict[str, str]:
    """X4 full-parity metadata map (scraper.py:354-483, field for field).

    ~25 renamed fields: title, description, og renames (ogTitle/ogImage/...),
    twitter:*, canonical_url, favicon, viewport, language, charset,
    contentType, authors, summary, published_at (3 sources), categories,
    site-id, app-version, author_images, docs-boost, fb:app_id.  Single
    finds keep the FIRST tag in document order (BeautifulSoup find);
    og/twitter loops let later duplicates overwrite (reference loop
    assignment)."""
    meta: dict[str, str] = {}
    metas = root.find_all({"meta"})
    links = root.find_all({"link"})

    def first_meta(attr: str, value: str) -> Node | None:
        for n in metas:
            if n.attrs.get(attr) == value:
                return n
        return None

    def content_of(n: Node | None) -> str | None:
        return (n.attrs.get("content") or "").strip() if n is not None else None

    for n in root.find_all({"title"}):
        meta["title"] = n.text().strip()
        break
    desc = content_of(first_meta("name", "description"))
    if desc is not None:
        meta["description"] = desc
    for n in metas:  # og:* rename loop (scraper.py:369-390)
        prop = n.attrs.get("property") or ""
        if not prop.startswith("og:"):
            continue
        key = prop.replace("og:", "")
        content = (n.attrs.get("content") or "").strip()
        if key and content:
            meta[_OG_RENAME.get(key, f"og{key.capitalize()}")] = content
    for n in metas:  # twitter:* loop (scraper.py:392-398)
        name = n.attrs.get("name") or ""
        if not name.startswith("twitter:"):
            continue
        key = name.replace("twitter:", "")
        content = (n.attrs.get("content") or "").strip()
        if key and content:
            meta[f"twitter:{key}"] = content
    for n in links:  # rel is multi-valued: token match (BS4 semantics)
        if "canonical" in (n.attrs.get("rel") or "").split():
            meta["canonical_url"] = (n.attrs.get("href") or "").strip()
            break
    for n in links:  # find(rel='icon') matches rel="shortcut icon" too
        if "icon" in (n.attrs.get("rel") or "").split():
            meta["favicon"] = (n.attrs.get("href") or "").strip()
            break
    for simple_name, out_key in (
        ("viewport", "viewport"),
        ("author", "authors"),
        ("summary", "summary"),
        ("site-id", "site-id"),
        ("app-version", "app-version"),
        ("docs-boost", "docs-boost"),
    ):
        v = content_of(first_meta("name", simple_name))
        if v is not None:
            meta[out_key] = v
    for n in root.find_all({"html"}):
        if n.attrs.get("lang"):
            meta["language"] = n.attrs["lang"]
        break
    for n in metas:
        if "charset" in n.attrs:
            meta["charset"] = (n.attrs.get("charset") or "").strip()
            break
    ct = content_of(first_meta("http-equiv", "content-type"))
    if ct is not None:
        meta["contentType"] = ct
    # published_at: og/article meta (property then name) else <time datetime>
    pub = first_meta("property", "article:published_time") or first_meta(
        "name", "article:published_time"
    )
    if pub is not None:
        if pub.attrs.get("content"):
            meta["published_at"] = pub.attrs["content"].strip()
    else:
        for n in root.find_all({"time"}):
            if n.attrs.get("datetime"):
                meta["published_at"] = n.attrs["datetime"].strip()
                break
    cat = (
        first_meta("property", "article:section")
        or first_meta("name", "article:section")
        or first_meta("property", "article:tag")
    )
    if cat is not None:
        meta["categories"] = content_of(cat)
    for n in root.find_all({"img"}):
        if _AUTHOR_IMG_RE.search(n.attrs.get("alt") or ""):
            meta["author_images"] = (n.attrs.get("src") or "").strip()
            break
    fb = first_meta("property", "fb:app_id")
    if fb is not None:
        meta["fb:app_id"] = content_of(fb)
    return meta


# --- X8/X9/X10: structured data (structured_data.py:11-147) ------------------


def extract_json_ld(root: Node) -> list[str]:
    """X8: every <script type="application/ld+json"> body that parses as
    JSON, kept as its raw JSON string (structured_data.py:40-53 skips
    malformed blocks; the engine stores strings per SURVEY §1.1 and parses
    on demand with from_json)."""
    out: list[str] = []
    for n in root.find_all({"script"}):
        if n.attrs.get("type") != "application/ld+json":
            continue
        body = n.text()
        try:
            _json.loads(body)
        except (ValueError, TypeError):
            continue
        out.append(body)
    return out


def _structured_language(root: Node, metas: list[Node]) -> str:
    """structured_data.py:11-38 fallback chain: html@lang primary-subtag ->
    content-language -> name=language -> og:locale (each split on '_')."""
    for n in root.find_all({"html"}):
        if n.attrs.get("lang"):
            return n.attrs["lang"].split("-")[0]
        break
    for attr, value in (
        ("http-equiv", "content-language"),
        ("name", "language"),
        ("property", "og:locale"),
    ):
        for n in metas:
            if n.attrs.get(attr) == value and n.attrs.get("content"):
                lang = n.attrs["content"].split("_")[0]
                if lang:
                    return lang
                break
    return ""


def extract_structured(root: Node) -> dict:
    """X8+X9+X10: the StructuredDataExtractor.extract_all shape
    (structured_data.py:103-147) — jsonLd (raw strings), openGraph
    (og:-stripped keys), twitterCard (twitter:-stripped), metaData (raw
    name|property keys minus og:/twitter:, plus the language chain)."""
    metas = root.find_all({"meta"})
    og: dict[str, str] = {}
    tw: dict[str, str] = {}
    md: dict[str, str] = {}
    for n in metas:
        prop = n.attrs.get("property") or ""
        name = n.attrs.get("name") or ""
        content = n.attrs.get("content")
        if prop.startswith("og:") and prop.replace("og:", "") and content:
            og[prop.replace("og:", "")] = content
        if name.startswith("twitter:") and name.replace("twitter:", "") and content:
            tw[name.replace("twitter:", "")] = content
        key = name or prop
        if key and content and not key.startswith(("og:", "twitter:")):
            md[key] = content
    md["language"] = _structured_language(root, metas)
    return {
        "jsonLd": extract_json_ld(root),
        "openGraph": og,
        "twitterCard": tw,
        "metaData": md,
    }


# --- X5: DOM -> markdown (html2text feature subset the reference uses) ------

_HEADING = {f"h{i}": i for i in range(1, 7)}
_WS_RE = re.compile(r"\s+")


# html2text 2024.2.26 utils.escape_md_section at escape_snob=False (the
# reference config, scraper.py:285-298): backslashes always; a dot after
# leading digits, a plus, or a dash escape only at the start of a DATA
# CHUNK or after a newline within it (the library's ^-anchored MULTILINE
# matchers run per handle_data chunk, BEFORE whitespace collapsing — so
# "see <b>x</b> 1. thing" escapes the mid-line "1." too, because the
# chunk " 1. thing" starts with it; transcribed quirk, not a choice).
_MD_BACKSLASH_RE = re.compile(r"(\\)")
_MD_DOT_RE = re.compile(r"^(\s*\d+)(\.)(?=\s)", re.M)
_MD_PLUS_RE = re.compile(r"^(\s*)(\+)(?=\s)", re.M)
_MD_DASH_RE = re.compile(r"^(\s*)(-)(?=\s|\-)", re.M)


def _escape_md_section(text: str) -> str:
    text = _MD_BACKSLASH_RE.sub(r"\\\1", text)
    text = _MD_DOT_RE.sub(r"\1\\\2", text)
    text = _MD_PLUS_RE.sub(r"\1\\\2", text)
    return _MD_DASH_RE.sub(r"\1\\\2", text)


def _inline(node: Node, in_code: bool = False) -> str:
    if node.tag == "":
        raw = node.attrs.get("text", "")
        if not in_code:  # html2text: no escaping when self.code/self.pre
            raw = _escape_md_section(raw)
        return _WS_RE.sub(" ", raw)
    in_code = in_code or node.tag == "code"
    inner = "".join(_inline(c, in_code) for c in node.children)
    if node.tag in ("strong", "b"):
        return f"**{inner.strip()}**" if inner.strip() else ""
    if node.tag in ("em", "i"):
        return f"*{inner.strip()}*" if inner.strip() else ""
    if node.tag == "a":
        href = node.attrs.get("href", "")
        label = inner.strip() or href
        return f"[{label}]({href})" if href else label
    if node.tag == "img":
        alt = node.attrs.get("alt") or "Image"
        src = node.attrs.get("src", "")
        title = node.attrs.get("title")
        if src and not title:
            title = src.split("/")[-1].split("?")[0]
        return f"![{alt}]({src} \"{title}\")" if title else f"![{alt}]({src})"
    if node.tag == "code":
        return f"`{inner}`"
    if node.tag == "br":
        return "\n"
    return inner


def _sep(lines: list[str]) -> None:
    """Paragraph break: one blank line between blocks (html2text's p())."""
    if lines and lines[-1] != "":
        lines.append("")


def _emit_list(node: Node, lines: list[str], stack: tuple[str, ...]) -> None:
    """html2text li emission (transcribed from html2text 2024.2.26 — the
    reference's pinned version — ``handle_tag`` for "li"): the indent is
    built per enclosing list, outermost first, INCLUDING this one: two
    spaces per level, except a ``ul`` whose parent list is an ``ol``
    contributes THREE spaces (aligning bullets under the ``N. `` marker).
    Marker is ``* `` for ul and an UNPADDED per-level ``N. `` counter for
    ol — html2text leaves items past 9 misaligned (its own in-source
    TODO), so we do too.  A nested list inside an <li> continues on the
    following lines at deeper indent, with no blank line between
    levels."""
    num = 0
    indent = ""
    parent = None
    for name in stack:
        indent += "   " if parent == "ol" and name == "ul" else "  "
        parent = name
    for c in node.children:
        if c.tag != "li":
            continue
        inline_parts = [
            _inline(g) for g in c.children if g.tag not in ("ul", "ol")
        ]
        text = "".join(inline_parts).strip()
        if node.tag == "ol":
            num += 1
            marker = f"{num}. "
        else:
            marker = "* "
        if text:
            lines.append(indent + marker + text)
        for g in c.children:
            if g.tag in ("ul", "ol"):
                _emit_list(g, lines, stack + (g.tag,))


def _quote_line(line: str) -> str:
    """html2text blockquote prefixing: ``bq = ">" * depth + " "`` — one
    level per pass; a line already quoted gains a bare ``>`` so nesting
    renders ``>> text``.  Blank separator lines become ``>``."""
    if not line:
        return ">"
    if line.startswith(">"):
        return ">" + line
    return "> " + line


def _block(node: Node, out: list[str], list_stack: list) -> None:
    tag = node.tag
    if tag in _HEADING:
        _sep(out)
        out.append("#" * _HEADING[tag] + " " + _inline(node).strip())
        return
    if tag == "p":
        t = _inline(node).strip()
        if t:
            _sep(out)
            out.extend(t.split("\n"))
        return
    if tag in ("ul", "ol"):
        items: list[str] = []
        _emit_list(node, items, stack=(tag,))
        if items:
            _sep(out)
            out.extend(items)
        return
    if tag == "pre":
        # mark_code=True emits [code]..[/code]; X6 rewrites to fences
        _sep(out)
        out.extend(("[code]\n" + node.text().strip("\n") + "\n[/code]").split("\n"))
        return
    if tag == "blockquote":
        inner: list[str] = []
        for c in node.children:
            _block(c, inner, list_stack)
        while inner and inner[-1] == "":
            inner.pop()
        while inner and inner[0] == "":
            inner.pop(0)
        if inner:
            _sep(out)
            out.extend(_quote_line(x) for x in inner)
        return
    if tag == "hr":
        _sep(out)
        out.append("* * *")
        return
    if tag == "table":
        # html2text row shape: first cell bare, later cells "| "-prefixed
        # ("a| b"), soft break per row, and a "---|---" underline after
        # the FIRST row (td_count columns) — scraper.py's config keeps
        # tables (ignore_tables=False, pad_tables default off)
        rows = []
        for tr in node.find_all({"tr"}):
            cells = [
                _inline(c).strip()
                for c in tr.children
                if c.tag in ("td", "th")
            ]
            if cells:
                rows.append(cells)
        if rows:
            _sep(out)
            out.append("| ".join(rows[0]))
            out.append("|".join(["---"] * max(len(rows[0]), 1)))
            for cells in rows[1:]:
                out.append("| ".join(cells))
        return
    if tag in ("img", "a", "strong", "em", "b", "i", "code", ""):
        t = _inline(node).strip()
        if t:
            _sep(out)
            out.append(t)
        return
    for c in node.children:
        _block(c, out, list_stack)


def dom_to_markdown(root: Node) -> str:
    out: list[str] = []
    _block(root, out, [])
    while out and out[0] == "":
        out.pop(0)
    while out and out[-1] == "":
        out.pop()
    return "\n".join(out)


# --- X6: post-process walker (scraper.py:543-662, exact semantics) ----------

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_HEADER_FIX_RE = re.compile(r"(#{1,6})([^#\s])")
_LIST_FIX_RE = re.compile(r"(\n\s*)-([^\s])")
_TRAIL_RE = re.compile(r"[ \t]+$", re.MULTILINE)
_XNL_RE = re.compile(r"\n{3,}")
_SINGLE_CHAR_LINE_RE = re.compile(r"^\s*[\*\.\-]\s*$", re.MULTILINE)
_STAR_LINE_RE = re.compile(r"^\s*\*\s*$", re.MULTILINE)


def post_process_markdown(markdown: str) -> str:
    markdown = _COMMENT_RE.sub("", markdown)
    markdown = markdown.replace("&nbsp;", " ").replace("\xa0", " ")
    markdown = _HEADER_FIX_RE.sub(r"\1 \2", markdown)
    markdown = _LIST_FIX_RE.sub(r"\1- \2", markdown)
    markdown = _TRAIL_RE.sub("", markdown)

    lines = markdown.split("\n")
    processed: list[str] = []
    in_code = False
    in_list = False
    for line in lines:
        line = line.rstrip()
        if line.startswith("```"):
            in_code = not in_code
            processed.append(line)
            continue
        if in_code:
            processed.append(line)
            continue
        if not line.strip():
            if processed and processed[-1].strip():
                processed.append("")
            continue
        if line.startswith("#"):
            if processed and processed[-1].strip():
                processed.append("")
            processed.append(line)
            processed.append("")
            in_list = False
            continue
        if line.strip().startswith(("-", "*", "+")) or re.match(r"^\s*\d+\.", line):
            if not in_list and processed and processed[-1].strip():
                processed.append("")
            processed.append(line)
            in_list = True
            continue
        else:
            in_list = False
        if line.strip().startswith("!["):
            if processed and processed[-1].strip():
                processed.append("")
            processed.append(line)
            processed.append("")
            continue
        processed.append(line)

    markdown = "\n".join(processed)
    markdown = _XNL_RE.sub("\n\n", markdown)
    markdown = _SINGLE_CHAR_LINE_RE.sub("", markdown)
    markdown = _XNL_RE.sub("\n\n", markdown)
    markdown = re.sub(r"\*\*Copy\n\[code\]", "Copy\n\n```", markdown)
    markdown = re.sub(r"\[/code\]", "```", markdown)
    markdown = re.sub(r"\[code\]", "```", markdown)
    markdown = _SINGLE_CHAR_LINE_RE.sub("", markdown)
    markdown = _XNL_RE.sub("\n\n", markdown)
    markdown = re.sub(
        r"(\n*)(```[\w]*\n.*?\n```)(\n*)", r"\n\n\2\n\n", markdown, flags=re.DOTALL
    )
    markdown = re.sub(r"(\n*)(!\[.*?\]\(.*?\))(\n*)", r"\n\n\2\n\n", markdown)
    markdown = _XNL_RE.sub("\n\n", markdown)
    markdown = _STAR_LINE_RE.sub("", markdown)
    markdown = re.sub(r"\n{3,}", "\n\n", markdown)
    return markdown.strip()


def html_to_markdown(html: str, only_main: bool = True) -> str:
    """The full X2+X3+X5+X6 pipeline on one document."""
    root = clean_tree(parse_html(html))
    target = root
    if only_main:
        main = find_main_content(root)
        if main is not None:
            target = main
    return post_process_markdown(dom_to_markdown(target))


# --- Spark faces -------------------------------------------------------------


@F.pandas_udf(T.StringType())
def _html_to_md_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: html_to_markdown(h) if h is not None else None)


def html_to_markdown_col(html: Column) -> Column:
    return _html_to_md_udf(html)


@F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
def _extract_meta_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda h: extract_meta(parse_html(h)) if h is not None else None
    )


def extract_meta_col(html: Column) -> Column:
    return _extract_meta_udf(html)


_STRUCTURED_SCHEMA = T.StructType(
    [
        T.StructField("jsonLd", T.ArrayType(T.StringType())),
        T.StructField("openGraph", T.MapType(T.StringType(), T.StringType())),
        T.StructField("twitterCard", T.MapType(T.StringType(), T.StringType())),
        T.StructField("metaData", T.MapType(T.StringType(), T.StringType())),
    ]
)


@F.pandas_udf(_STRUCTURED_SCHEMA)
def _extract_structured_udf(html: pd.Series) -> pd.DataFrame:
    rows = [
        extract_structured(parse_html(h))
        if h is not None
        else {"jsonLd": [], "openGraph": {}, "twitterCard": {}, "metaData": {"language": ""}}
        for h in html
    ]
    return pd.DataFrame(rows)


def extract_structured_col(html: Column) -> Column:
    """X8-X10 on raw HTML: struct<jsonLd, openGraph, twitterCard, metaData>
    (models/response.py:15-19 shape)."""
    return _extract_structured_udf(html)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _extract_links_udf(html: pd.Series) -> pd.Series:
    def links(h):
        if h is None:
            return None
        return [
            n.attrs["href"]
            for n in parse_html(h).find_all({"a"})
            if n.attrs.get("href")
        ]

    return html.map(links)


def extract_links_col(html: Column) -> Column:
    """X1 on raw HTML (the BeautifulSoup <a href> harvest,
    link_extractor.py:107-121)."""
    return _extract_links_udf(html)
