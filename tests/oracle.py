"""Deterministic pure-Python reference oracle (SURVEY.md §5.1).

A faithful, single-threaded reimplementation of the reference crawl
semantics, auditable line-by-line against the citations:

- admission: first-seen wins, ``depth <= max_depth`` and
  ``len(seen) < max_pages`` checked at add time
  (/root/reference/services/crawler/queue_manager.py:34-57)
- FIFO queue; children enqueued as each page is processed
  (crawler_service.py:119-167); loop breaks when pages >= max_pages
  (crawler_service.py:125-127)
- link pipeline: urljoin+strip normalization, same-domain, exclude, include,
  robots — in extract_links order (link_extractor.py:48-121); link sets
  iterated **sorted** per the SURVEY.md §2.10 determinism contract
- children extracted only when ``depth < max_depth``
  (crawler_service.py:61)
- markdown: DocumentStructure tree render (document_structure.py:67-186),
  implemented here as the reference does — build a heading tree, then
  recursive depth-first render — deliberately a *different algorithm* from
  the engine's flat single-pass (eget_spark/functions/spans.py), so the
  equality tests are meaningful.

The oracle also models the engine's politeness extension (per-host
crawl_delay budgets per round) so politeness tests have ground truth; with
no delayed hosts it degenerates to the exact reference FIFO BFS.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlparse


def normalize_url(href: str, base: str) -> str | None:
    try:
        parsed = urlparse(urljoin(base, href))
        return parsed._replace(fragment="", params="", query="").geturl()
    except (ValueError, AttributeError):
        return None


@dataclass
class OracleConfig:
    seed_urls: list[str]
    max_depth: int = 3
    max_pages: int = 100
    exclude_patterns: list[str] = field(default_factory=list)
    include_patterns: list[str] = field(default_factory=list)
    respect_robots_txt: bool = True
    restrict_domain: bool = True
    round_window: float = 10.0
    max_pages_per_host: int | None = None


@dataclass
class OracleResult:
    order: list[tuple]  # (seq, url, depth, parent_url, round)
    seen: set[str]
    pages: list[tuple]  # (url, status, round) in fetch order
    success_count: int
    failed_count: int


def oracle_crawl(
    corpus: dict[str, list[dict]],
    config: OracleConfig,
    robots: dict[str, tuple[list[str], float]] | None = None,
) -> OracleResult:
    """corpus: doc_id -> spans (list of dicts with kind/text/media_ref/offset).
    robots: host -> (disallow_prefixes, crawl_delay)."""
    base_domain = urlparse(config.seed_urls[0]).netloc
    exclude = [re.compile(p) for p in config.exclude_patterns]
    include = [re.compile(p) for p in config.include_patterns]
    robots = robots or {}

    def allowed_by_robots(url: str) -> bool:
        if not config.respect_robots_txt:
            return True
        p = urlparse(url)
        prefixes, _ = robots.get(p.netloc, ([], 0.0))
        path = p.path or ""
        return not any(path.startswith(pref) for pref in prefixes)

    def should_include(url: str) -> bool:
        if config.restrict_domain and urlparse(url).netloc != base_domain:
            return False
        for pat in exclude:
            if pat.search(url):
                return False
        if include:
            return any(pat.search(url) for pat in include)
        return True

    seen: dict[str, int] = {}  # url -> seq
    order: list[tuple] = []
    pending: list[tuple] = []  # (seq, url, depth, parent)

    host_admitted: dict[str, int] = {}

    def admit(url: str, depth: int, parent: str | None, rnd: int) -> None:
        if url not in seen and depth <= config.max_depth and len(seen) < config.max_pages:
            if config.max_pages_per_host is not None:
                h = urlparse(url).netloc
                if host_admitted.get(h, 0) >= config.max_pages_per_host:
                    return
                host_admitted[h] = host_admitted.get(h, 0) + 1
            seq = len(seen)
            seen[url] = seq
            order.append((seq, url, depth, parent, rnd))
            pending.append((seq, url, depth, parent))

    for u in config.seed_urls:
        admit(u, 0, None, 0)

    pages: list[tuple] = []
    success = failed = 0
    rnd = 0
    while pending and success < config.max_pages:
        rnd += 1
        # politeness split: per delayed host, lowest-seq up to budget
        pending.sort()
        budget_left: dict[str, int] = {}
        fetch_now, deferred = [], []
        for item in pending:
            host = urlparse(item[1]).netloc
            _, delay = robots.get(host, ([], 0.0))
            if config.respect_robots_txt and delay and delay > 0.0:
                if host not in budget_left:
                    budget_left[host] = max(1, int(config.round_window // delay))
                if budget_left[host] > 0:
                    budget_left[host] -= 1
                    fetch_now.append(item)
                else:
                    deferred.append(item)
            else:
                fetch_now.append(item)
        pending = deferred

        for seq, url, depth, parent in fetch_now:
            spans = corpus.get(url)
            if spans is None:
                failed += 1
                pages.append((url, "missing", rnd))
                continue
            success += 1
            pages.append((url, "ok", rnd))
            if depth < config.max_depth:
                links = set()
                for s in spans:
                    if s["kind"] == "link":
                        n = normalize_url(s["media_ref"], url)
                        if n and should_include(n) and allowed_by_robots(n):
                            links.add(n)
                for link in sorted(links):
                    admit(link, depth + 1, url, rnd)

    return OracleResult(
        order=order,
        seen=set(seen),
        pages=pages,
        success_count=success,
        failed_count=failed,
    )


# ---------------------------------------------------------------------------
# Markdown assembly oracle: reference-shaped tree build + recursive render
# (document_structure.py:33-186)
# ---------------------------------------------------------------------------


@dataclass
class _El:
    kind: str
    text: str
    ref: str
    level: int | None = None
    children: list = field(default_factory=list)


def _build_tree(spans: list[dict]) -> list[_El]:
    roots: list[_El] = []
    stack: list[_El] = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "heading":
            m = re.match(r"^(#{1,6})\s*", s["text"] or "")
            level = len(m.group(1)) if m else 1
            el = _El("heading", (s["text"] or "")[m.end():] if m else s["text"], "", level)
            while stack and stack[-1].level is not None and stack[-1].level >= level:
                stack.pop()
            (stack[-1].children if stack else roots).append(el)
            stack.append(el)
        else:
            el = _El(s["kind"], s["text"] or "", s["media_ref"] or "")
            (stack[-1].children if stack else roots).append(el)
    return roots


def _render_el(el: _El, level: int) -> str:
    if el.kind == "heading":
        return f"{'#' * el.level} {el.text}"
    if el.kind == "paragraph":
        return el.text
    if el.kind == "list":
        items = el.text.split("\n")
        indent = "    " * level
        if items and re.match(r"^\d+\.\s", items[0]):
            items = [re.sub(r"^\d+\.\s", "", it) for it in items]
            return "\n".join(f"{indent}{i}. {it}" for i, it in enumerate(items, 1))
        return "\n".join(f"{indent}- {it}" for it in items)
    if el.kind == "table":
        rows = [r.split("\t") for r in el.text.split("\n")]
        if not rows or not rows[0]:
            return ""
        widths = [0] * len(rows[0])
        for row in rows:
            for i, c in enumerate(row[: len(widths)]):
                widths[i] = max(widths[i], len(str(c)))

        def fmt_row(row):
            return "|" + "|".join(
                f" {str(c).replace('|', chr(92) + '|'):<{w}} " for c, w in zip(row, widths)
            ) + "|"

        lines = [fmt_row(rows[0]), "|" + "|".join(f":{'-' * w}" for w in widths) + "|"]
        lines += [fmt_row(r) for r in rows[1:]]
        return "\n".join(lines)
    if el.kind == "image":
        return f"![{el.text or 'Image'}]({el.ref})"
    if el.kind == "code":
        lang, _, body = el.text.partition("\n")
        return f"```{lang}\n{body}\n```"
    if el.kind == "math":
        return f"${el.text}$"
    if el.kind == "separator":
        return "---"
    if el.kind == "link":
        return f"[{el.text}]({el.ref})"
    return ""  # metadata / footnote / citation


def _render_list_of_els(els: list[_El], level: int = 0) -> str:
    parts = []
    for el in els:
        content = _render_el(el, level)
        if content:
            parts.append(content)
        if el.children:
            child = _render_list_of_els(el.children, level + 1)
            if child:
                parts.append(child)
    return "\n\n".join(p.strip() for p in parts if p.strip())


def oracle_markdown(spans: list[dict]) -> str:
    return _render_list_of_els(_build_tree(spans))
