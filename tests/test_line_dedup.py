"""Cross-corpus line dedup vs a Python oracle + scale-shape plan pins."""

from __future__ import annotations


def _oracle(docs: list[tuple[str, str]]) -> dict[str, tuple[str, int, int]]:
    """First occurrence of each non-blank line (doc order, line order)
    wins; blank (space-trimmed-empty) lines always survive."""
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(docs):
        kept = []
        total = 0
        for line in text.split("\n"):
            total += 1
            if line.strip(" ") == "":
                kept.append(line)
            elif line not in seen:
                seen.add(line)
                kept.append(line)
        out[doc_id] = ("\n".join(kept), len(kept), total - len(kept))
    return out


def test_line_dedup_matches_python_oracle(spark):
    from eget_spark.operators.line_dedup import dedup_lines

    docs = [
        ("a", "Home\nAbout\n\nreal content of a\nHome"),
        ("b", "Home\nunique b line\n\nreal content of b"),
        ("c", "Home\nAbout"),
        ("d", ""),
        ("e", "echo line\nfresh e text\necho line"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string").repartition(4)
    got = {r["id"]: (r["text"], r["n_lines"], r["n_dropped"])
           for r in dedup_lines(df).collect()}
    assert got == _oracle(docs)
    # intra-document duplicates also dedup (docs a and e repeat a line)
    assert got["a"][0].count("Home") == 1
    assert got["e"][0] == "echo line\nfresh e text"


def test_line_dedup_order_col(spark):
    """A custom document order flips which copy survives."""
    from pyspark.sql import functions as F

    from eget_spark.operators.line_dedup import dedup_lines

    df = spark.createDataFrame(
        [("a", "shared line", 2), ("b", "shared line", 1)],
        "doc_id string, text string, prio int",
    )
    got = {r["id"]: r["n_lines"] for r in dedup_lines(df, order_col="prio").collect()}
    assert got == {"a": 0, "b": 1}  # b (prio 1) wins under the custom order


def test_line_dedup_scale_shape(spark):
    """The winner per distinct line is a map-side-combined HashAggregate
    (partial_min), NOT a per-line window — a 10^8-occurrence boilerplate
    line must collapse before the shuffle; and no Python stages."""
    from eget_spark.operators.line_dedup import dedup_lines

    df = spark.createDataFrame([("a", "x\ny")], "doc_id string, text string")
    plan = dedup_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_plan_has_no_line_keyed_join(spark):
    """Round-5 skew hardening: the kept-line set comes straight out of
    the min-struct aggregate — the plan must contain NO join at all on
    the exploded-lines side before reassembly (a join keyed on line text
    would send every copy of a 10^8-occurrence boilerplate line to one
    reducer)."""
    import re

    from eget_spark.operators.line_dedup import dedup_lines

    df = spark.createDataFrame(
        [(1, "home\nabout\nhome"), (2, "home\ncontact")],
        "doc_id long, text string",
    )
    plan = dedup_lines(df)._jdf.queryExecution().executedPlan().toString()
    # the only joins allowed are the id-keyed reassembly joins

    for m in re.finditer(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\n]*", plan):
        assert "line" not in m.group(0), m.group(0)


def test_hot_line_corpus_correct(spark):
    """A synthesized hot-key corpus (one boilerplate line on every doc)
    still dedups exactly per the Python oracle."""
    from eget_spark.operators.line_dedup import dedup_lines

    rows = [(i, f"Home\nunique {i} content\nHome") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: (r["text"], r["n_lines"], r["n_dropped"])
           for r in dedup_lines(df).collect()}
    want = _oracle(rows)
    assert got == want
