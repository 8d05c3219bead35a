"""Capture .explain('formatted') for the round-6 touched queries into
plans/r06/<query>_after.txt (and _before.txt when generated from the
round-start tree).

Several query builders end in an eager localCheckpoint, which would
collapse the captured plan to one `Scan ExistingRDD` line; for CAPTURE
ONLY this script rebinds DataFrame.localCheckpoint to identity so the
full pipeline shape is visible.  Never used for measurement or
correctness.

Usage: python tools/capture_plans_r06.py <suffix> [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q01_crawl_bfs",
    "q13_minhash_sig",
    "q14_minhash_lsh_pairs",
    "q15_ngram_jaccard",
    "q22_semantic_chunks",
    "q53_contamination",
    "q83_sequence_packing",
    "q86_cms_host_counts",
    "q91_containment_pairs",
    "q93_pq_codes",
    "q99_normalized_dedup",
    "q125_bpe_pairs",
    "q127_ivf_pq_search",
    "q173_opic",
    "q178_dust_rules",
    "q254_latency_drift",
    "q265_classifier_auc",
    "q285_fdr_hosts",
    "q300_fdr_hosts_by",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "_after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]

    import pyspark.sql

    pyspark.sql.DataFrame.localCheckpoint = (  # capture-only: keep lineage
        lambda self, eager=True: self
    )
    try:  # Spark 4: the concrete class overrides the base method
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        _CDF.localCheckpoint = lambda self, eager=True: self
    except ImportError:
        pass

    import __spark_entry__ as entry
    from eget_spark.session import get_spark

    spark = get_spark(app_name="capture_plans", cores=8, shuffle_partitions=16)
    qs = entry.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in (only or QUERIES):
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"{name}: ok", flush=True)
        except Exception as e:  # capture what we can, report the rest
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
