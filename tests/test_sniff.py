"""Magic-byte content sniffing over real file-format prefixes."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.functions.sniff import sniff_content_type

CASES = [
    (b"\x89PNG\r\n\x1a\n" + b"idat...", "image/png"),
    (b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
    (b"GIF89a\x01\x00", "image/gif"),
    (b"GIF87a\x01\x00", "image/gif"),
    (b"%PDF-1.7\n%...", "application/pdf"),
    (b"\x1f\x8b\x08\x00\x00", "application/gzip"),
    (b"PK\x03\x04\x14\x00", "application/zip"),
    (b"<!DOCTYPE html><html>", "text/html"),
    (b"  \n\t<HTML><body>", "text/html"),
    (b"<html lang=en>", "text/html"),
    (b"plain text, nothing special", "application/octet-stream"),
    (b"\x00\x01\x02\x03", "application/octet-stream"),
    (b"PK\x05\x06 empty zip EOCD only", "application/octet-stream"),
]


def test_sniff_known_magics(spark):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, (p, _) in enumerate(CASES)],
        "i int, payload binary",
    )
    got = {
        r["i"]: r["ct"]
        for r in df.select(
            "i", sniff_content_type(F.col("payload")).alias("ct")
        ).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, CASES[i][0], got[i])


def test_sniff_is_jvm_only(spark):
    df = spark.createDataFrame([(bytearray(b"%PDF-1.4"),)], "payload binary")
    plan = (
        df.select(sniff_content_type(F.col("payload")).alias("ct"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
