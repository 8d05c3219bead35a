"""User-facing facade: the reference's four endpoints as DataFrame verbs.

A user of the reference calls POST /scrape, /api/v1/crawl, /api/v1/chunk,
/api/v1/convert/file (SURVEY.md §3); the engine exposes the same four
capabilities over DataFrames:

- `scrape(spark, urls, corpus, ...)`  — single-page extraction for a set of
  URLs: markdown + structured data + links, no BFS
  (reference: main.py:161-182 -> WebScraper.scrape ->
  _process_page_data, scraper.py:1230-1355)
- `crawl(...)`                        — plans/crawl.py (re-exported)
- `chunk(spark, urls, corpus, ...)`   — scrape then chunk the markdown
  (reference: chunker endpoint -> ChunkService.process_url,
  chunk_service.py:65-216: scrape -> _clean_markdown -> chunker)
- `convert(files)`                    — sources/converters.convert_files

`scrape` on raw HTML (a DataFrame with an `html` column) uses the X2-X6
pipeline (functions/html.py) instead of the span corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.html import extract_links_col, extract_meta_col, html_to_markdown_col
from .functions.metadata import validated_structured_data
from .functions.spans import assemble_markdown, link_targets
from .functions.text import clean_markdown
from .operators.chunker import chunk_semantic, chunk_sentences
from .plans.crawl import CrawlConfig, CrawlResult, crawl  # noqa: F401  (re-export)
from .sources.converters import convert_files as convert  # noqa: F401


def scrape(
    urls: DataFrame,
    corpus: DataFrame,
    url_col: str = "url",
    include_links: bool = True,
) -> DataFrame:
    """Scrape a set of URLs against the corpus: one row per requested URL
    with (url, success, markdown, structured_data, links).

    Failures (URL not in corpus) mirror the reference's success=False
    payload (scraper.py:1269-1293): success=false, null fields.
    """
    u = urls.select(F.col(url_col).alias("url")).dropDuplicates(["url"])
    joined = u.join(corpus, u["url"] == corpus["doc_id"], "left")
    out = joined.select(
        "url",
        F.col("doc_id").isNotNull().alias("success"),
        F.when(
            F.col("doc_id").isNotNull(), assemble_markdown(F.col("spans"))
        ).alias("markdown"),
        F.when(
            F.col("doc_id").isNotNull(), validated_structured_data(F.col("spans"))
        ).alias("structured_data"),
        *(
            [
                F.when(
                    F.col("doc_id").isNotNull(), link_targets(F.col("spans"))
                ).alias("links")
            ]
            if include_links
            else []
        ),
    )
    return out


def scrape_html(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Scrape raw HTML pages (X2-X6 pipeline): markdown + metadata + links."""
    return pages.select(
        F.col(url_col).alias("url"),
        html_to_markdown_col(F.col(html_col)).alias("markdown"),
        extract_meta_col(F.col(html_col)).alias("metadata"),
        extract_links_col(F.col(html_col)).alias("links"),
    )


def chunk(
    urls: DataFrame,
    corpus: DataFrame,
    chunker_type: str = "semantic",
    url_col: str = "url",
    **chunker_kwargs,
) -> DataFrame:
    """The /api/v1/chunk path: scrape -> clean markdown (X11, quirk-exact)
    -> semantic or sentence chunker."""
    scraped = scrape(urls, corpus, url_col=url_col, include_links=False).where(
        F.col("success")
    )
    cleaned = scraped.select(
        F.col("url").alias("doc_id"),
        clean_markdown(F.col("markdown")).alias("markdown"),
    )
    if chunker_type == "semantic":
        return chunk_semantic(cleaned, **chunker_kwargs)
    if chunker_type == "sentence":
        return chunk_sentences(cleaned, **chunker_kwargs)
    raise ValueError(f"unknown chunker_type: {chunker_type}")
