"""WARC 1.0 (ISO 28500) reader/writer — the web-archive interchange format.

A web-scale crawler's natural bulk I/O is WARC: Common Crawl publishes it,
archive tooling consumes it.  The reference stores crawl results as JSON
API payloads (/root/reference/services/crawler/crawler_service.py); at
100 TB the engine needs the archival format instead.  Implemented from the
PUBLIC spec (ISO 28500 / the IIPC warc-specifications text): version line,
CRLF named fields, Content-Length octet counts, two trailing CRLFs per
record, and optional per-record gzip members (the Common Crawl layout —
a .warc.gz is a CONCATENATION of independently-gzipped records, so a
reader can seek to any record).

Everything is stdlib (gzip, io, hashlib); the distributed read is ONE
Arrow `mapInPandas` pass over `binaryFile` rows (or any (path, content)
table) — files parse independently, so parallelism = file count and the
operator needs no shuffle at all.  The sink mirrors it: one WARC blob per
input partition, records in deterministic (sort-key) order.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = b"\r\n"

WARC_RECORDS_DDL = (
    "path string, record_idx int, url string, warc_date string, "
    "status int, content_type string, payload binary, "
    "offset long, rec_len long"
)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _record_id(url: str, date: str) -> str:
    """Deterministic RFC-4122-shaped id (md5-derived): WARC requires a
    unique WARC-Record-ID per record; hashing (url, date) keeps the writer
    reproducible, which the roundtrip oracles rely on."""
    h = hashlib.md5(f"{url}\x00{date}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def build_record_bytes(
    url: str,
    payload: bytes,
    date: str = "2024-01-01T00:00:00Z",
    status: int = 200,
    content_type: str = "text/html",
    reason: str | None = None,
) -> bytes:
    """One WARC response record: WARC headers + an HTTP/1.1 response block."""
    reason = reason or {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        status, "Unknown"
    )
    http = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload
    headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + f"WARC-Record-ID: {_record_id(url, date)}".encode() + CRLF
        + f"WARC-Date: {date}".encode() + CRLF
        + f"WARC-Target-URI: {url}".encode() + CRLF
        + b"Content-Type: application/http;msgtype=response" + CRLF
        + f"Content-Length: {len(http)}".encode() + CRLF
    )
    return headers + CRLF + http + CRLF + CRLF


def build_warc_bytes(records: list[dict], gzip_members: bool = False) -> bytes:
    """records: [{url, payload, date?, status?, content_type?}] -> one WARC
    file.  ``gzip_members=True`` gzips each record independently (the
    seekable Common Crawl .warc.gz layout)."""
    out = io.BytesIO()
    for r in records:
        raw = build_record_bytes(
            r["url"],
            r["payload"],
            date=r.get("date", "2024-01-01T00:00:00Z"),
            status=int(r.get("status", 200)),
            content_type=r.get("content_type", "text/html"),
        )
        if gzip_members:
            # mtime pinned: gzip headers embed a timestamp; 0 keeps the
            # bytes deterministic
            out.write(gzip.compress(raw, mtime=0))
        else:
            out.write(raw)
    return out.getvalue()


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _inflate(data: bytes) -> bytes:
    """Transparently inflate (multi-member) gzip; plain bytes pass through
    (sniffed on the 1f 8b magic).  ``gzip.decompress`` handles member
    concatenation — exactly the seekable .warc.gz layout."""
    if data[:2] != b"\x1f\x8b":
        return data
    return gzip.decompress(data)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All response records of one WARC file (plain or per-record gzip):
    [{url, warc_date, status, content_type, payload}].  Non-response
    records (warcinfo, request, metadata) are skipped.  Tolerates LF-only
    header lines and case-insensitive field names."""
    data = _inflate(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # seek the version line
        vstart = data.find(b"WARC/", pos)
        if vstart < 0:
            break
        # the FIRST blank line ends the header block — an LF-only header
        # section can be followed by CRLF pairs later in the body, so
        # take whichever terminator occurs earliest
        e_crlf = data.find(b"\r\n\r\n", vstart)
        e_lf = data.find(b"\n\n", vstart)
        if e_crlf < 0 and e_lf < 0:
            break
        if e_lf < 0 or (0 <= e_crlf <= e_lf):
            hdr_end, sep = e_crlf, 4
        else:
            hdr_end, sep = e_lf, 2
        headers: dict[str, str] = {}
        for line in data[vstart:hdr_end].splitlines()[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                    "latin-1"
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body = data[hdr_end + sep : hdr_end + sep + length]
        pos = hdr_end + sep + length
        if headers.get("warc-type", "").lower() != "response":
            continue
        status = 0
        content_type = ""
        payload = body
        if body[:5] == b"HTTP/":
            b_crlf = body.find(b"\r\n\r\n")
            b_lf = body.find(b"\n\n")
            if b_lf < 0 or (0 <= b_crlf <= b_lf):
                he, hs = b_crlf, 4
            else:
                he, hs = b_lf, 2
            if he >= 0:
                head = body[:he]
                payload = body[he + hs :]
                lines = head.splitlines()
                parts = lines[0].split(b" ", 2)
                if len(parts) >= 2:
                    try:
                        status = int(parts[1])
                    except ValueError:
                        status = 0
                for line in lines[1:]:
                    k, _, v = line.partition(b":")
                    if _ and k.strip().lower() == b"content-type":
                        content_type = v.strip().decode("latin-1")
        records.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "status": status,
                "content_type": content_type,
                "payload": payload,
                # CDX fields: where the record starts in this (inflated)
                # stream and how many bytes its header+content block spans
                # (excluding the trailing CRLF CRLF separators) — the
                # range-request coordinates a web-archive index serves
                "offset": vstart,
                "rec_len": (hdr_end + sep + length) - vstart,
            }
        )
    return records


# ---------------------------------------------------------------------------
# distributed read / write
# ---------------------------------------------------------------------------


def read_warc(files: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """(path, content) rows -> one row per response record.  One Arrow
    mapInPandas pass; no shuffle (files parse independently — at Common
    Crawl scale parallelism is the segment-file count)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for path, content in zip(b[path_col], b[content_col]):
                for i, r in enumerate(parse_warc_bytes(bytes(content))):
                    rows.append(
                        (path, i, r["url"], r["warc_date"], r["status"],
                         r["content_type"], r["payload"], r["offset"],
                         r["rec_len"])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_idx", "url", "warc_date", "status",
                    "content_type", "payload", "offset", "rec_len",
                ],
            )

    return files.mapInPandas(run, WARC_RECORDS_DDL)


def write_warc_partitions(
    docs: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    status_col: str | None = None,
    content_type_col: str | None = None,
    date_col: str | None = None,
    order_col: str | None = None,
    gzip_members: bool = False,
) -> DataFrame:
    """The WARC sink: one (file_name, content) row per input partition,
    records ordered by ``order_col`` (default: url) within the file so the
    bytes are a pure function of the partition's row SET.  Pre-partition
    (e.g. ``df.repartition(n, "host")``) to control file layout."""
    import pandas as pd

    order = order_col or url_col

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        rows = []
        for b in batches:
            rows.append(b)
        if not rows:
            return
        part = pd.concat(rows).sort_values(order, kind="mergesort")
        records = []
        for _, r in part.iterrows():
            records.append(
                {
                    "url": r[url_col],
                    # a null payload (e.g. a page whose converter produced
                    # no text) is a legal zero-length response body
                    "payload": b"" if r[payload_col] is None else bytes(r[payload_col]),
                    "status": int(r[status_col]) if status_col else 200,
                    "content_type": r[content_type_col]
                    if content_type_col
                    else "text/html",
                    "date": r[date_col] if date_col else "2024-01-01T00:00:00Z",
                }
            )
        blob = build_warc_bytes(records, gzip_members=gzip_members)
        name = hashlib.md5(
            "\x00".join(str(r["url"]) for r in records).encode()
        ).hexdigest()
        yield pd.DataFrame(
            [(f"part-{name}.warc" + (".gz" if gzip_members else ""), blob, len(records))],
            columns=["file_name", "content", "n_records"],
        )

    return docs.mapInPandas(run, "file_name string, content binary, n_records long")


def revisit_dedup(
    captures: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    time_col: str = "fetch_time",
) -> DataFrame:
    """WARC revisit-record assignment — the web archive's storage dedup
    (WARC 1.1 §6.7.2, profile ``identical-payload-digest``: the PUBLIC
    IIPC spec; what Heritrix/wayback call "URL-agnostic dedup" restricted
    here to the per-URL form CDX servers index).  A recrawl that fetched
    byte-identical content does not store the payload again: the first
    capture of each (url, payload digest) in fetch-time order is the full
    ``response`` record; every later identical capture becomes a
    ``revisit`` record that stores ZERO payload bytes and refers to the
    original capture's timestamp (``WARC-Refers-To-Date``).

    The reference keeps one cached copy per URL hash with a TTL
    (/root/reference/services/cache/cache_service.py) — lossy overwrite;
    revisit records keep the full capture HISTORY at dedup storage cost.

    Output: ``(url, fetch_time, digest, record_type, refers_to,
    stored_bytes)`` — ``refers_to`` NULL on originals, ``stored_bytes``
    the payload octet count on originals and 0 on revisits.

    Scale shape: ONE hash exchange — a window keyed on (url, digest),
    whose partitions hold at most the recrawl count of one unchanged
    page (politeness-bounded; no hot key at 10^10 URLs).  The digest is
    JVM ``sha2`` inside codegen — no Python anywhere."""
    from pyspark.sql.window import Window

    base = captures.select(
        F.col(url_col).alias("url"),
        F.col(time_col).cast("long").alias("fetch_time"),
        F.sha2(F.col(payload_col), 256).alias("digest"),
        F.octet_length(F.col(payload_col)).cast("long").alias("_plen"),
    )
    first_t = F.min("fetch_time").over(Window.partitionBy("url", "digest"))
    is_orig = F.col("fetch_time") == first_t
    return base.select(
        "url",
        "fetch_time",
        "digest",
        F.when(is_orig, F.lit("response")).otherwise(F.lit("revisit")).alias(
            "record_type"
        ),
        F.when(~is_orig, first_t).cast("long").alias("refers_to"),
        F.when(is_orig, F.col("_plen")).otherwise(F.lit(0)).cast("long").alias(
            "stored_bytes"
        ),
    )


def zipnum_blocks(
    keys: DataFrame, key_col: str = "surt", block_size: int = 3000
) -> DataFrame:
    """ZipNum-style prefix-compressed CDX index blocks — the layout the
    web-archive secondary index actually uses (pywb/OpenWayback ZipNum
    clusters: the sorted CDX line stream is cut into fixed-count blocks,
    each compressed independently, and a small secondary index keeps one
    (first key, block) row per block).  Sorted SURT keys share long
    prefixes (a whole site shares ``host)``), so per-block front-coding
    — store each key as (LCP with the previous key, suffix); the block's
    FIRST key restarts at LCP 0 so blocks stay independently decodable —
    is what makes a 10^10-URL index fit.  This operator reports the
    per-block layout: first key (the secondary-index entry), key count,
    raw vs front-coded character volume, and the savings fraction.

    Scale shape: the global sort rank comes from
    :func:`~eget_spark.operators.sequence.with_global_seq` (range
    exchange + per-partition rank — never a single-partition window);
    the LCP window partitions by block id, whose partitions are capped
    at ``block_size`` rows by construction.  LCP itself is pure
    higher-order column algebra (split/zip_with/array_position) inside
    codegen — lengths in characters (SURT keys are ASCII by
    construction: lowercased + percent-encoded)."""
    from pyspark.sql.window import Window

    from ..operators.sequence import with_global_seq

    ranked = with_global_seq(
        keys.select(F.col(key_col).alias("key")), ["key"], start=0, seq_col="_rank"
    ).df
    blocked = ranked.withColumn(
        "block_id", F.floor(F.col("_rank") / block_size).cast("long")
    )
    w = Window.partitionBy("block_id").orderBy("key", "_rank")
    prev = F.lag("key").over(w)
    eq = F.zip_with(
        F.split(prev, ""),
        F.split(F.col("key"), ""),
        lambda x, y: F.coalesce(x == y, F.lit(False)),
    )
    first_diff = F.array_position(eq, F.lit(False))
    lcp = (
        F.when(prev.isNull(), F.lit(0))
        .when(first_diff == 0, F.length("key"))
        .otherwise(first_diff - 1)
    )
    per_key = blocked.select(
        "block_id", "key", F.length("key").alias("_len"), lcp.alias("_lcp")
    )
    agg = per_key.groupBy("block_id").agg(
        F.min("key").alias("first_key"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum("_len").cast("long").alias("raw_chars"),
        F.sum(F.col("_len") - F.col("_lcp")).cast("long").alias("stored_chars"),
    )
    return agg.select(
        "block_id",
        "first_key",
        "n_keys",
        "raw_chars",
        "stored_chars",
        F.when(
            F.col("raw_chars") > 0,
            F.round(1.0 - F.col("stored_chars") / F.col("raw_chars"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("savings"),
    )
