"""PII detection/redaction (operators/pii.py).

Covers the pinned pattern contract (email -> ip -> phone redaction
order), counter attribution on progressively-redacted text, the
no-PII identity path, and a Python-``re`` cross-check so the column
expressions match an independent implementation of the same patterns.
"""

from __future__ import annotations

import re

import pytest

from eget_spark.operators.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    scrub_pii,
)

CASES = [
    # (doc_id, text, expected_redacted, n_emails, n_ips, n_phones)
    (0, "no pii here at all", "no pii here at all", 0, 0, 0),
    (
        1,
        "mail a.b+c_d%e@sub.example.co.uk twice x@y.io!",
        "mail <EMAIL> twice <EMAIL>!",
        2,
        0,
        0,
    ),
    (
        2,
        "host 192.168.0.1 and 10.0.0.255 end",
        "host <IP> and <IP> end",
        0,
        2,
        0,
    ),
    (
        3,
        "call +1-555-0142 or 555.123.4567 now",
        "call <PHONE> or <PHONE> now",
        0,
        0,
        2,
    ),
    # order contract: the IP is consumed by the IP pass, so the phone
    # pass never half-eats its digit runs
    (
        4,
        "ip 10.20.30.40 then phone +49-555-123 then bob@x.de",
        "ip <IP> then phone <PHONE> then <EMAIL>",
        1,
        1,
        1,
    ),
    # 999.999.999.999 is NOT octet-validated (C4-style over-redaction)
    (5, "bad ip 999.999.999.999 ok", "bad ip <IP> ok", 0, 1, 0),
    (6, "", "", 0, 0, 0),
    # boundary guard: a longer digit run never gets a suffix redacted
    # (no stray residue digit before <PHONE>)
    (7, "order 1234-567-8901 shipped", "order 1234-567-8901 shipped", 0, 0, 0),
    # optional 4th segment (extension form) is swallowed whole
    (8, "fax +1-555-123-4567 now", "fax <PHONE> now", 0, 0, 1),
    # phone at start of text (the ^ alternative of the guard group)
    (9, "555-123-4567 was dialed", "<PHONE> was dialed", 0, 0, 1),
    # trailing guard: a PREFIX of a longer digit run never redacts
    # (no stray residue digit after <PHONE>)
    (10, "code 555-123-45678 is long", "code 555-123-45678 is long", 0, 0, 0),
    # phone at end of text (the $ alternative of the trailing guard)
    (11, "dial 555-123-4567", "dial <PHONE>", 0, 0, 1),
]


def _py_scrub(text: str):
    """Independent re-implementation with Python's re module."""
    n_email = len(re.findall(EMAIL_RE, text))
    after_email = re.sub(EMAIL_RE, "<EMAIL>", text)
    n_ip = len(re.findall(IPV4_RE, after_email))
    after_ip = re.sub(IPV4_RE, "<IP>", after_email)
    n_phone = len(re.findall(PHONE_RE, after_ip))
    redacted = re.sub(PHONE_RE, r"\1<PHONE>\4", after_ip)
    return redacted, n_email, n_ip, n_phone


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in CASES], "doc_id long, text string"
    )
    rows = scrub_pii(df, "doc_id", "text").collect()
    return {r["id"]: r for r in rows}


@pytest.mark.parametrize("doc_id,text,want,n_e,n_i,n_p", CASES)
def test_scrub_cases(scrubbed, doc_id, text, want, n_e, n_i, n_p):
    row = scrubbed[doc_id]
    assert row["text"] == want
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (n_e, n_i, n_p)
    assert row["has_pii"] == ((n_e + n_i + n_p) > 0)


@pytest.mark.parametrize("doc_id,text,want,n_e,n_i,n_p", CASES)
def test_python_re_agrees(doc_id, text, want, n_e, n_i, n_p):
    # the pinned patterns must mean the same thing to Python's re as to
    # Spark's Java regex (and, via the q59 oracle, DuckDB's RE2)
    assert _py_scrub(text) == (want, n_e, n_i, n_p)


def test_plan_is_map_side(spark):
    """The scrub must stay a single project over the scan: no exchange,
    no Python eval — the 100-TB contract from the module docstring."""
    df = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = scrub_pii(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
