"""Table-corpus mining: interleaved table spans -> long (row, col, cell).

Training-data-pipeline extension: structured-table corpora (WebTables /
TaBERT-style pretraining data) are mined from crawled pages by exploding
every extracted table into position-addressed cells.  The engine's
converters emit tables as spans with ``kind='table'`` whose text packs
rows with ``\\n`` and cells with ``\\t`` (sources/converters.py:232 —
the same contract the markdown renderer consumes, functions/spans.py:95).

Plan shape: three nested ``posexplode`` generators (span -> row -> cell)
over per-row arrays — generators chain inside one stage, so the whole
extraction is a single pass with ZERO shuffles and zero Python; cell
addressing (table_idx within doc, row_idx, col_idx) falls out of the
generator ordinals, no window needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_table_cells(
    docs: DataFrame, id_col: str, spans_col: str
) -> DataFrame:
    """(id, table_idx, row_idx, col_idx, cell) — one row per table cell.

    ``table_idx`` numbers the doc's table spans 0..n-1 in span order
    (non-table spans don't advance it); empty rows/cells survive as
    empty strings (position integrity beats trimming — downstream
    filters decide).
    """
    tables = F.filter(
        F.col(spans_col), lambda s: s["kind"] == F.lit("table")
    )
    t = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(tables).alias("table_idx", "span"),
    )
    rows = t.select(
        "id",
        F.col("table_idx").cast("long").alias("table_idx"),
        F.posexplode(F.split(F.col("span.text"), "\n")).alias(
            "row_idx", "row"
        ),
    )
    return rows.select(
        "id",
        "table_idx",
        F.col("row_idx").cast("long").alias("row_idx"),
        F.posexplode(F.split(F.col("row"), "\t")).alias("col_idx", "cell"),
    ).select(
        "id",
        "table_idx",
        "row_idx",
        F.col("col_idx").cast("long").alias("col_idx"),
        "cell",
    )
