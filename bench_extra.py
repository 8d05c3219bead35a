"""Round-6 measurement harness (guide §1.1/§1.4) — bench.py is FROZEN, so
every optimization-iteration measurement lives here.

Per-query isolation at any SF with the driver's own methodology
(``df.count()`` after building the query, exactly like bench.py) plus an
optional noop-sink pass (computes every column — catches wins that
``count()``'s column pruning would hide) and ``.explain("formatted")``
capture for plans/r06/<query>_{before,after}.txt.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 \
      --queries q91_containment_pairs,q99_normalized_dedup \
      --reps 3 [--noop] [--explain plans/r06 --suffix _before]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True, help="comma-separated query names")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink pass")
    ap.add_argument("--explain", default=None, help="directory for plan capture")
    ap.add_argument("--suffix", default="", help="plan file suffix, e.g. _before")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from eget_spark.session import get_spark
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="eget_bench_extra", cores=cpus,
                      shuffle_partitions=max(cpus, 16))

    # same warmup as bench.py: exclude executor-boot costs
    warm = spark.read.parquet(f"{args.sf}/documents.parquet")
    warm.join(warm.select("doc_id").limit(10), "doc_id").select(
        F.sum(F.length("text"))
    ).collect()

    qs = entry.queries()
    names = [n for n in args.queries.split(",") if n]
    out: dict[str, dict] = {}
    for name in names:
        rec: dict[str, list | str] = {"count": [], "noop": []}
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}: count")
            t0 = time.monotonic()
            df = qs[name](spark, args.sf)
            df.count()
            rec["count"].append(round(time.monotonic() - t0, 3))
        if args.noop:
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"{name}: noop")
                t0 = time.monotonic()
                df = qs[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                rec["noop"].append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            p = plan_of(qs[name](spark, args.sf))
            path = os.path.join(args.explain, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(p)
            rec["plan"] = path
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"sf": args.sf, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
