"""Capture physical plans for the engine's key operators -> PLANS.md.

Checks the properties the 100 TB story depends on:
- parquet scans show PushedFilters + pruned ReadSchema
- the robots join is a BroadcastHashJoin
- dedup/minhash pipelines stay inside WholeStageCodegen (no row-at-a-time
  Python in the hot path; pandas UDFs appear only as ArrowEvalPython)
- the LSH self-join is an equi hash join on the band key
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__ as entry
from eget_spark.session import get_spark
from eget_spark.operators.links import robots_allowed

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(app_name="plans", cores=8)
    out = ["# PLANS — physical-plan evidence for key operators\n"]
    checks: list[tuple[str, bool]] = []

    def add(name, df, want: dict[str, bool], note: str):
        p = plan_of(df)
        out.append(f"## {name}\n\n{note}\n\n```\n{p}\n```\n")
        for token, expected in want.items():
            ok = (token in p) == expected
            checks.append((f"{name}: {'has' if expected else 'lacks'} {token}", ok))

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # 1. filter + projection pushdown to the parquet scan
    add(
        "filter+projection pushdown",
        docs.where(F.col("lang") == "en").select("doc_id", "n_chars"),
        {"PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]": True},
        "Predicate reaches the scan; ReadSchema carries only 3 columns.",
    )

    # 2. robots broadcast join
    robots = spark.createDataFrame(
        [("h.example.com", ["/p/1"], 0.0)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    urls = docs.selectExpr("'https://h.example.com/p/' || doc_id AS url")
    add(
        "robots gate (J2)",
        robots_allowed(urls, robots),
        {"BroadcastHashJoin": True, "SortMergeJoin": False},
        "The tiny robots table is broadcast; no shuffle of the URL side.",
    )

    # 3. minhash signatures: codegen'd agg with partial (map-side) combine
    add(
        "minhash signatures",
        entry.q13_minhash_sig(spark, SF),
        # AQE initial plans don't print codegen ids; the property that
        # matters is HashAggregate (codegen-capable, long buffers) instead
        # of the SortAggregate fallback that min(string) would force
        {"HashAggregate": True, "SortAggregate": False, "partial_min": True, "BatchEvalPython": False},
        "Explode->groupBy(min) with map-side partial aggregation; no Python.",
    )

    # 4. LSH pair join: equi hash join on (band, sig)
    add(
        "minhash LSH band join",
        entry.q14_minhash_lsh_pairs(spark, SF),
        {"BatchEvalPython": False},
        "Candidate pairs via equi-join on the band signature.",
    )

    # 5. brute-force topk: broadcast of the query side, codegen'd score
    add(
        "cosine top-k",
        entry.q17_sim_topk(spark, SF),
        {"BroadcastNestedLoopJoin": True, "BatchEvalPython": False},
        "Query side broadcast; corpus streamed once.",
    )

    # 6. span assembly: the ONE pandas UDF in the extract path (ArrowEval)
    add(
        "span assembly (X7)",
        entry.q08_span_assembly(spark, SF),
        {"ArrowEvalPython": True, "BatchEvalPython": False},
        "Arrow-vectorized UDF — the only Python stage, by design (table "
        "rendering needs a loop); everything around it is codegen.",
    )

    out.append("## Check summary\n")
    for name, ok in checks:
        out.append(f"- {'PASS' if ok else 'FAIL'} — {name}")
        print(("PASS " if ok else "FAIL ") + name)
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
