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
reference walker; X5 implements the html2text feature subset the reference
relies on (headings, emphasis, links, images, lists, code via
[code]-marks, blockquote, hr) — byte parity with html2text itself is not
claimed (library absent), the X5+X6 composition is pinned by golden tests.
"""

from __future__ import annotations

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


def extract_meta(root: Node) -> dict[str, str]:
    """X4 core fields (scraper.py:354-483 subset + structured_data.py:55-101)."""
    meta: dict[str, str] = {}
    for n in root.find_all({"title"}):
        meta.setdefault("title", n.text().strip())
        break
    for n in root.find_all({"meta"}):
        key = n.attrs.get("property") or n.attrs.get("name")
        content = n.attrs.get("content")
        if key and content is not None:
            meta.setdefault(key, content)
    for n in root.find_all({"link"}):
        if n.attrs.get("rel") == "canonical" and n.attrs.get("href"):
            meta.setdefault("canonical_url", n.attrs["href"])
    for n in root.find_all({"html"}):
        if n.attrs.get("lang"):
            meta.setdefault("language", n.attrs["lang"])
    if "language" not in meta:
        meta["language"] = meta.get("content-language", meta.get("og:locale", ""))
    return meta


# --- X5: DOM -> markdown (html2text feature subset the reference uses) ------

_HEADING = {f"h{i}": i for i in range(1, 7)}
_WS_RE = re.compile(r"\s+")


def _inline(node: Node) -> str:
    if node.tag == "":
        return _WS_RE.sub(" ", node.attrs.get("text", ""))
    inner = "".join(_inline(c) for c in node.children)
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


def _block(node: Node, out: list[str], list_stack: list) -> None:
    tag = node.tag
    if tag in _HEADING:
        out.append("#" * _HEADING[tag] + " " + _inline(node).strip())
        return
    if tag == "p":
        t = _inline(node).strip()
        if t:
            out.append(t)
        return
    if tag in ("ul", "ol"):
        items = []
        idx = 1
        for c in node.children:
            if c.tag == "li":
                marker = f"{idx}. " if tag == "ol" else "  * "
                items.append(marker + _inline(c).strip())
                idx += 1
        if items:
            out.append("\n".join(items))
        return
    if tag == "pre":
        # mark_code=True emits [code]..[/code]; X6 rewrites to fences
        out.append("[code]\n" + node.text().strip("\n") + "\n[/code]")
        return
    if tag == "blockquote":
        t = _inline(node).strip()
        if t:
            out.append("> " + t)
        return
    if tag == "hr":
        out.append("* * *")
        return
    if tag == "table":
        rows = []
        for tr in node.find_all({"tr"}):
            cells = [
                _inline(c).strip()
                for c in tr.children
                if c.tag in ("td", "th")
            ]
            if cells:
                rows.append("| " + " | ".join(cells) + " |")
        if rows:
            if len(rows) > 1:
                ncols = rows[0].count("|") - 1
                rows.insert(1, "|" + "---|" * ncols)
            out.append("\n".join(rows))
        return
    if tag in ("img", "a", "strong", "em", "b", "i", "code", ""):
        t = _inline(node).strip()
        if t:
            out.append(t)
        return
    for c in node.children:
        _block(c, out, list_stack)


def dom_to_markdown(root: Node) -> str:
    out: list[str] = []
    _block(root, out, [])
    return "\n\n".join(p for p in out if p.strip())


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
