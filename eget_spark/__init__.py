"""eget_spark — a PySpark-native crawl-analytics engine.

A from-scratch reimplementation of the query / data-processing capabilities
of `vishwajeetdabholkar/eGet-Crawler-for-ai` (reference at /root/reference,
snapshot 2025-09-12) as declarative Spark DataFrame dataflow:

- URL-frontier BFS crawl loop with first-seen dedup, depth/page budgets,
  regex include/exclude filters and robots.txt politeness
  (reference: services/crawler/{crawler_service,queue_manager,link_extractor}.py)
- interleaved text+media document model:
  ``doc_id:string, spans:array<struct<kind,text,media_ref,offset>>``
- span -> markdown assembly, metadata extraction, semantic & sentence
  chunking, PDF/DOCX/XLSX -> span converters
- scale extensions: Bloom- or cuckoo-filtered seen-set (cuckoo = deletable,
  for recrawl/expiry), per-host politeness scheduling with skew salting and
  optional priority-queue ordering (PageRank from operators/graph.py),
  per-host page caps, exact/minhash/simhash/SRP dedup, ANN similarity
  search, bucketed-corpus co-located fetch joins, watermarked streaming
  monitoring aggregations.

Everything is DataFrame/SQL-first; Python only ever runs inside
Arrow-vectorized pandas UDFs (`pandas_udf` / `applyInPandas` /
`mapInPandas`) — no row-at-a-time UDFs, no RDD maps.
"""

__version__ = "0.1.0"

from .api import chunk, convert, scrape, scrape_html  # noqa: E402,F401
from .operators.cuckoo import (  # noqa: E402,F401
    ShardedCuckoo,
    build_cuckoo,
    expire_from_filter,
)
from .operators.graph import pagerank, pagerank_fixed  # noqa: E402,F401
from .plans.crawl import CrawlConfig, CrawlResult, crawl, recrawl  # noqa: E402,F401
from .plans.tables import write_bucketed_corpus  # noqa: E402,F401
from .operators.decontaminate import (  # noqa: E402,F401
    contamination_flags,
    decontaminate,
)
from .operators.traps import trap_scores, url_template  # noqa: E402,F401
from .pipeline import prepare_training_data  # noqa: E402,F401
from .session import get_spark  # noqa: E402,F401
