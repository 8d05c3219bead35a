"""Charset sniffing (functions/sniff.sniff_charset)."""

import pyspark.sql.functions as F

from eget_spark.functions.sniff import sniff_charset


def _sniff(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "i long, payload binary",
    )
    rows = df.select("i", sniff_charset(F.col("payload")).alias("c")).collect()
    return [r["c"] for r in sorted(rows, key=lambda r: r["i"])]


def test_bom_tier_wins(spark):
    got = _sniff(
        spark,
        [
            b"\xef\xbb\xbf<meta charset=\"latin-1\">",  # BOM beats meta
            b"\xff\xfe\x00t",
            b"\xfe\xff\x00t",
        ],
    )
    assert got == ["utf-8", "utf-16le", "utf-16be"]


def test_meta_and_http_equiv_and_xml(spark):
    got = _sniff(
        spark,
        [
            b'<html><meta charset=windows-1251></html>',   # unquoted
            b"<html><meta charset='KOI8-R'></html>",       # single-quoted
            b'<meta http-equiv="Content-Type" content="text/html; charset=Big5">',
            b'<?xml version="1.0" encoding="EUC-JP"?><r/>',
        ],
    )
    assert got == ["windows-1251", "koi8-r", "big5", "euc-jp"]


def test_default_utf8(spark):
    got = _sniff(spark, [b"plain old text", b"<html><body>no decl</body></html>"])
    assert got == ["utf-8", "utf-8"]


def test_meta_beyond_1kib_ignored(spark):
    payload = b"<html>" + b" " * 1100 + b'<meta charset="latin-2">'
    assert _sniff(spark, [payload]) == ["utf-8"]
