"""Iceberg-branch contract tests (plans/tables.RoundTable with catalog=).

No Iceberg jars exist in this sandbox, so the branch is exercised by
stubbing ``DataFrame.writeTo``/``SparkSession.table`` and asserting the
calls the deployment path would make: append-first with the qualified
``<catalog>.<table>`` identifier, create-on-first-append with
``using("iceberg").partitionedBy("round")``, reads via
``spark.table(<catalog>.<table>)``, and the unconfigured-catalog guard."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, SparkSession

from eget_spark.plans.tables import RoundTable


class _WriterStub:
    """Records the writeTo fluent chain; optionally fails the first
    append (the table-does-not-exist case)."""

    def __init__(self, log, full, df, fail_append):
        self.log = log
        self.full = full
        self.df = df
        self.fail_append = fail_append
        self.using_fmt = None
        self.partition_cols = None

    def append(self):
        if self.fail_append and not any(op == "create" for op, *_ in self.log):
            self.log.append(("append_failed", self.full))
            raise RuntimeError("table not found (stub)")
        self.log.append(("append", self.full, sorted(self.df.columns)))

    def using(self, fmt):
        self.using_fmt = fmt
        return self

    def partitionedBy(self, *cols):
        self.partition_cols = cols
        return self

    def create(self):
        self.log.append(
            ("create", self.full, self.using_fmt, self.partition_cols)
        )


@pytest.fixture
def cat(spark):
    """A configured-but-fake catalog name (the gate checks only that the
    session has the conf key)."""
    spark.conf.set("spark.sql.catalog.egetcat", "stub.Catalog")
    yield "egetcat"
    spark.conf.unset("spark.sql.catalog.egetcat")


def _stub_write(spark, monkeypatch, log, fail_append=False):
    def write_to(self, full):
        return _WriterStub(log, full, self, fail_append)

    # patch the CONCRETE DataFrame class (pyspark 4: classic.dataframe)
    cls = type(spark.range(1))
    monkeypatch.setattr(cls, "writeTo", write_to)


def test_unconfigured_catalog_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="not configured"):
        RoundTable(spark, str(tmp_path), "docs", catalog="nope")


def test_append_targets_qualified_identifier(spark, cat, tmp_path, monkeypatch):
    log = []
    _stub_write(spark, monkeypatch, log)
    t = RoundTable(spark, str(tmp_path), "docs", catalog=cat)
    df = spark.createDataFrame([("u1", 1)], "url string, depth int")
    t.append(df, round_no=3)
    assert log == [("append", "egetcat.docs", ["depth", "round", "url"])]
    # the round lineage column is stamped on the appended frame


def test_first_append_creates_round_partitioned_iceberg(
    spark, cat, tmp_path, monkeypatch
):
    log = []
    _stub_write(spark, monkeypatch, log, fail_append=True)
    t = RoundTable(spark, str(tmp_path), "admitted", catalog=cat)
    df = spark.createDataFrame([("u1",)], "url string")
    t.append(df, round_no=0)
    assert log[0] == ("append_failed", "egetcat.admitted")
    assert log[1] == ("create", "egetcat.admitted", "iceberg", ("round",))


def test_reads_go_through_catalog_table(spark, cat, tmp_path, monkeypatch):
    t = RoundTable(spark, str(tmp_path), "docs", catalog=cat)
    base = spark.createDataFrame(
        [("u1", 0), ("u2", 1), ("u3", 2)], "url string, round int"
    )
    asked = []

    def table(self, name):
        asked.append(name)
        return base

    monkeypatch.setattr(type(spark), "table", table)
    assert {r["url"] for r in t.read().collect()} == {"u1", "u2", "u3"}
    assert {r["url"] for r in t.read_round(1).collect()} == {"u2"}
    assert "round" not in t.read_round(1).columns  # parquet-branch parity
    assert {r["url"] for r in t.read_upto(1).collect()} == {"u1", "u2"}
    assert t.rounds() == [0, 1, 2]
    assert set(asked) == {"egetcat.docs"}
