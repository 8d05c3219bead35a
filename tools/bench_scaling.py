"""Two-parallelism scaling evidence (BASELINE.json north_rule).

Runs the identical frontier-expansion crawl on the identical synthetic
corpus at local[N] and local[4N] (sandbox stand-in for N vs 4N executors),
reports throughput at both plus scaling efficiency
eff = (thr_4N / thr_N) / 4, and writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [N] [scale] [max_pages]
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one_run(cores: int, scale: str, max_pages: int) -> dict:
    from pyspark.sql import SparkSession

    from bench import run_crawl_bench
    from eget_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        time.sleep(2)
    spark = get_spark(
        app_name=f"scaling_{cores}", cores=cores, shuffle_partitions=max(cores, 16)
    )
    # warm up the JVM + python worker pool so the first round isn't cold
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    stats = run_crawl_bench(spark, scale=scale, max_pages=max_pages)
    spark.stop()
    time.sleep(2)
    return stats


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scale = sys.argv[2] if len(sys.argv) > 2 else "medium"
    max_pages = int(sys.argv[3]) if len(sys.argv) > 3 else 30000

    lo = one_run(n, scale, max_pages)
    hi = one_run(4 * n, scale, max_pages)
    eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / 4.0
    result = {
        "metric": "frontier expansion throughput (URLs fetched+extracted/sec)",
        "scale": scale,
        "max_pages": max_pages,
        f"local[{n}]": lo,
        f"local[{4*n}]": hi,
        "scaling_efficiency_Nto4N": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = f"""# BENCH/BASELINE — frontier-expansion throughput & scaling

Generated {stamp} by `python tools/bench_scaling.py {n} {scale} {max_pages}`.

Metric (BASELINE.json): URLs fetched+extracted per second over the synthetic
interleaved-docs corpus (`eget_spark.synth`, scale `{scale}`), fixed
multi-round whole-web crawl (multi-host seeds, depth 10, max_pages
{max_pages}), measured end-to-end including link extraction, normalization,
filtering, dedup, admission sequencing and lineage checkpointing.

The north rule's two-cluster-size criterion (N vs 4N executors) is evidenced
in this sandbox by running the identical job on identical input at two
parallelism levels:

| parallelism | wall (s) | URLs attempted | rounds | throughput (URLs/s) |
|---|---|---|---|---|
| local[{n}]  | {lo['wall_sec']} | {lo['urls_attempted']} | {lo['rounds']} | {lo['urls_per_sec']} |
| local[{4*n}] | {hi['wall_sec']} | {hi['urls_attempted']} | {hi['rounds']} | {hi['urls_per_sec']} |

**Scaling efficiency** `eff = (thr_4N / thr_N) / 4` = **{eff:.3f}**
(target >= 0.8 per BASELINE.json; note local-mode threads share one JVM,
one driver and one disk — a conservative stand-in for separate executors).

Reference single-node baseline (BASELINE.md): 2-3.3 pages/s upper bound
(10 concurrent browsers x 1 page / 3-5 s); the engine's corpus-join fetch
boundary replaces browser latency, so the comparable number is the
end-to-end fetch+extract pipeline throughput above.
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
