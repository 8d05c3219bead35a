from __future__ import annotations

import pytest

from eget_spark.session import get_spark
from eget_spark.synth import build_docs, build_robots


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="eget_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_small(spark):
    df = build_docs(spark, "small", n_partitions=8).persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def robots_small(spark):
    return build_robots(spark, "small").persist()


@pytest.fixture(scope="session")
def corpus_small(docs_small):
    """Collected corpus for the pure-Python oracle: doc_id -> spans."""
    rows = docs_small.select("doc_id", "spans").collect()
    return {
        r["doc_id"]: [s.asDict() for s in r["spans"]] for r in rows
    }


@pytest.fixture(scope="session")
def robots_dict(robots_small):
    return {
        r["host"]: (list(r["disallow_prefixes"]), float(r["crawl_delay"]))
        for r in robots_small.collect()
    }
