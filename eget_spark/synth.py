"""Deterministic synthetic interleaved-docs corpus (FIXTURES.md).

The corpus encodes a synthetic web: `link` spans form the crawl graph, so
"fetching" a URL = joining the frontier against this table (SURVEY.md S2/J1).
Generation is seeded per-document (`random.Random(f"{seed}:{host}:{page}")`),
so it is order-independent and can be produced distributed via
``mapInPandas`` at any scale — no driver-side materialization.

No network, no external data.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import DOCS_SCHEMA, ROBOTS_SCHEMA, SEEDS_SCHEMA

_VOCAB = (
    "frontier crawl span markdown table heading paragraph anchor budget "
    "politeness robots depth queue seen bloom salt shard partition arrow "
    "batch vector column codegen shuffle broadcast lineage snapshot resume "
    "offset media corpus graph host page link fetch extract chunk convert"
).split()

_LANGS = ["en", "de", "fr", "es", "zh"]


@dataclass(frozen=True)
class CorpusSpec:
    """Host/page layout of a corpus scale (FIXTURES.md §7)."""

    n_hosts: int
    pages_hot: int  # pages on host 0 (the skew host)
    pages_other: int
    seed: int = 42
    links: tuple[int, int] = (2, 6)  # link spans per doc
    body_spans: tuple[int, int] = (3, 11)  # non-link body spans per doc

    @property
    def total_docs(self) -> int:
        return self.pages_hot + (self.n_hosts - 1) * self.pages_other

    def pages_of(self, host_idx: int) -> int:
        return self.pages_hot if host_idx == 0 else self.pages_other


SCALES = {
    # FIXTURES.md: 8 hosts x 40 pages, h0 hot with +160 -> 480 docs
    "small": CorpusSpec(n_hosts=8, pages_hot=200, pages_other=40),
    "medium": CorpusSpec(n_hosts=64, pages_hot=2000, pages_other=760),
    # ~1M span rows: 512 hosts, 1 hot
    "bench": CorpusSpec(n_hosts=512, pages_hot=20000, pages_other=130),
    # scaling-evidence corpus: heavier docs so per-round compute (markdown
    # assembly, link normalization) dominates fixed round overhead
    "benchxl": CorpusSpec(
        n_hosts=1024,
        pages_hot=30000,
        pages_other=400,
        links=(6, 12),
        body_spans=(20, 40),
    ),
    # ~1M docs: amortizes the fixed per-round driver floor so the scaling
    # measurement reflects the dataflow, not scheduler constants — the
    # sandbox stand-in for "bigger cluster, bigger input"
    "benchxxl": CorpusSpec(
        n_hosts=1024,
        pages_hot=30000,
        pages_other=970,
        links=(6, 12),
        body_spans=(20, 40),
    ),
    # ~2M docs: the size-robustness corpus for a SECOND scaling-evidence
    # point at the same 2->8 pair (higher-core pairs are hardware-capped
    # on this sandbox: measured calibration ceilings ~0.78-0.83 at 4->16,
    # ~0.64 at 8->32 — below the >=0.8 criterion ANY job could evidence)
    "benchxxxl": CorpusSpec(
        n_hosts=2048,
        pages_hot=30000,
        pages_other=970,
        links=(6, 12),
        body_spans=(20, 40),
    ),
    # ~4M docs: the top of the size-robustness ladder (200k -> 350k ->
    # 800k -> 1.6M -> 3.2M crawled pages), same per-doc weight as the
    # other scaling corpora so walls compare across sizes
    "benchxxxxl": CorpusSpec(
        n_hosts=4096,
        pages_hot=30000,
        pages_other=970,
        links=(6, 12),
        body_spans=(20, 40),
    ),
}


def host_name(host_idx: int) -> str:
    return f"h{host_idx}.example.com"


def doc_url(host_idx: int, page: int) -> str:
    return f"https://{host_name(host_idx)}/p/{page:05d}"


def _normalize(url: str, base: str) -> str:
    """Ground-truth normalization (mirrors link_extractor.py:48-67)."""
    from urllib.parse import urljoin, urlparse

    parsed = urlparse(urljoin(base, url))
    return parsed._replace(fragment="", params="", query="").geturl()


def gen_doc(spec: CorpusSpec, host_idx: int, page: int) -> dict:
    """Generate one interleaved document. Pure, deterministic."""
    host = host_name(host_idx)
    url = doc_url(host_idx, page)
    rng = random.Random(f"{spec.seed}:{host}:{page}")

    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str = "", media_ref: str = "") -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    def words(lo: int, hi: int) -> str:
        return " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(lo, hi)))

    # leading heading + metadata span
    add("heading", f"# {host} page {page:05d}")
    meta = {
        "title": f"{host} page {page:05d}",
        "description": words(4, 10),
        "og:title": f"og {page:05d}",
        "og:site_name": host,
        "twitter:card": "summary",
        "lang": rng.choice(_LANGS),
    }
    add("metadata", json.dumps(meta, sort_keys=True))

    # link spans, forming the crawl graph
    n_links = rng.randint(*spec.links)
    true_links: list[str] = []
    for k in range(n_links):
        if rng.random() < 0.70:
            tgt_host = host_idx
        else:
            tgt_host = rng.randrange(spec.n_hosts)
        npages = spec.pages_of(tgt_host)
        if rng.random() < 0.05:
            tgt_page = npages + rng.randrange(50)  # dangling: fetch miss
        else:
            tgt_page = rng.randrange(npages)
        absolute = doc_url(tgt_host, tgt_page)
        # raw href variants exercising F1 normalization
        r = rng.random()
        if tgt_host == host_idx and r < 0.25:
            href = f"/p/{tgt_page:05d}"
        elif tgt_host == host_idx and r < 0.40:
            href = f"p/{tgt_page:05d}"
        else:
            href = absolute
        r2 = rng.random()
        if r2 < 0.06:
            href += f"#sec{k}"
        elif r2 < 0.12:
            href += f"?q={k}"
        add("link", f"link to {tgt_page:05d}", href)
        true_links.append(_normalize(href, url))

    # body spans
    for _ in range(rng.randint(*spec.body_spans)):
        kind = rng.choices(
            ["paragraph", "list", "table", "code", "math", "image", "separator"],
            weights=[50, 12, 8, 10, 4, 8, 8],
        )[0]
        if kind == "paragraph":
            add("paragraph", words(8, 40))
        elif kind == "list":
            items = [words(2, 5) for _ in range(rng.randint(2, 5))]
            if rng.random() < 0.4:  # ordered: items carry canonical markers
                add("list", "\n".join(f"{i}. {it}" for i, it in enumerate(items, 1)))
            else:
                add("list", "\n".join(items))
        elif kind == "table":
            ncols = rng.randint(2, 4)
            nrows = rng.randint(2, 4)
            header = "\t".join(f"col{c}" for c in range(ncols))
            rows = [
                "\t".join(words(1, 2) for _ in range(ncols)) for _ in range(nrows)
            ]
            add("table", "\n".join([header, *rows]))
        elif kind == "code":
            lang = rng.choice(["python", "sql", ""])
            body = "\n".join(f"x{j} = {rng.randrange(100)}" for j in range(rng.randint(1, 4)))
            add("code", f"{lang}\n{body}")
        elif kind == "math":
            add("math", f"e = mc^{rng.randrange(2, 9)}")
        elif kind == "image":
            sha8 = f"{rng.getrandbits(32):08x}"
            add("image", words(1, 3), f"img://{sha8}")
        else:
            add("separator", "")

    return {
        "doc_id": url,
        "spans": spans,
        "host": host,
        "true_out_links": true_links,
    }


def _idx_to_host_page(spec: CorpusSpec, idx: int) -> tuple[int, int]:
    if idx < spec.pages_hot:
        return 0, idx
    rest = idx - spec.pages_hot
    return 1 + rest // spec.pages_other, rest % spec.pages_other


def build_docs(spark: SparkSession, scale: str = "small", n_partitions: int = 32) -> DataFrame:
    """Distributed corpus generation: spark.range -> mapInPandas(gen_doc)."""
    spec = SCALES[scale]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                gen_doc(spec, *_idx_to_host_page(spec, int(i))) for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    return (
        spark.range(spec.total_docs)
        .repartition(n_partitions)
        .mapInPandas(gen, schema=DOCS_SCHEMA)
    )


def build_robots(spark: SparkSession, scale: str = "small") -> DataFrame:
    """Politeness rules (FIXTURES.md §3): h1 disallows /p/0001*, h2 has
    crawl_delay 0.5; at larger scales every 16th/8th host respectively."""
    spec = SCALES[scale]
    rows = []
    for i in range(spec.n_hosts):
        disallow = ["/p/0001"] if (i == 1 or (spec.n_hosts > 8 and i % 16 == 1)) else []
        delay = 0.5 if (i == 2 or (spec.n_hosts > 8 and i % 8 == 2)) else 0.0
        rows.append((host_name(i), disallow, delay))
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def build_seeds(spark: SparkSession, urls: list[str] | None = None) -> DataFrame:
    urls = urls or [doc_url(0, 0)]
    return spark.createDataFrame([(u, 0) for u in urls], SEEDS_SCHEMA)


def write_corpus(spark: SparkSession, out_dir: str, scale: str = "small") -> None:
    docs = build_docs(spark, scale)
    docs.repartition(32, F.col("host")).write.mode("overwrite").parquet(f"{out_dir}/docs")
    build_robots(spark, scale).write.mode("overwrite").parquet(f"{out_dir}/robots")
    build_seeds(spark).write.mode("overwrite").parquet(f"{out_dir}/seeds")
