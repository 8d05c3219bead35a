"""Caption mining over interleaved text+media span sequences.

Training-data-pipeline extension (not a reference operator, but built on
the reference's interleaved span model — eGet emits documents as ordered
``(kind, text, media_ref, offset)`` spans, crawler/extractors/content_extractor
span assembly): image-text pairing is the standard way multimodal corpora
(LAION-style alt-text mining, OBELICS-style interleaved documents) are
built from crawled pages.  For every MEDIA span (image/video) we attach
the nearest preceding and nearest following TEXT span (heading/paragraph)
within the same document — the two candidate captions a pairing heuristic
chooses from — and pick ``caption = before if present else after``.

Plan shape: one ``posexplode`` of the span array, two window functions
partitioned by ``doc_id`` (``last(.., ignorenulls)`` over the preceding
frame, ``first(.., ignorenulls)`` over the following frame), then a filter
to media spans.  The window partitions by document — spans-per-doc is
bounded (page-sized, ~10^2), so there is no skew and no single-partition
stage; at 100 TB this is one url-hash shuffle, the same key the crawl
already partitions by.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "video")
TEXT_KINDS = ("heading", "paragraph")


def caption_pairs(
    docs: DataFrame,
    id_col: str,
    spans_col: str,
    media_kinds: tuple[str, ...] = MEDIA_KINDS,
    text_kinds: tuple[str, ...] = TEXT_KINDS,
) -> DataFrame:
    """(id, media_ref, media_kind, offset, caption_before, caption_after,
    caption) — one row per media span.

    ``caption_before`` is the text of the nearest earlier text span in
    the doc (null if the media span leads the doc), ``caption_after``
    the nearest later one; ``caption`` prefers before (the HTML
    convention: captions/alt-text context usually precedes the figure).
    Deterministic; ties impossible (span offsets are unique per doc).
    """
    s = F.posexplode(F.col(spans_col)).alias("pos", "span")
    flat = docs.select(
        F.col(id_col).cast("long").alias("id"), s
    ).select(
        "id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").cast("long").alias("offset"),
    )
    is_text = F.col("kind").isin(*text_kinds)
    txt = F.when(is_text, F.col("text"))
    w = Window.partitionBy("id").orderBy("pos")
    before = F.last(txt, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    after = F.first(txt, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        flat.withColumn("caption_before", before)
        .withColumn("caption_after", after)
        .filter(F.col("kind").isin(*media_kinds))
        .select(
            "id",
            "media_ref",
            F.col("kind").alias("media_kind"),
            "offset",
            "caption_before",
            "caption_after",
            F.coalesce("caption_before", "caption_after").alias("caption"),
        )
    )
