"""Bench harness (driver contract).

Runs the headline queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
frontier-expansion crawl bench (the BASELINE.json metric) on the synthetic
multi-host corpus, and prints ONE JSON line:

  {"metric": ..., "value": <total headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "crawl": {...}}

Two-parallelism scaling evidence (N vs 4N executors stand-in) is produced
by tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_crawl_bfs",
    "q08_span_assembly",
    "q09_text_metrics",
    "q11_quality",
    "q12_dedup_exact",
    "q13_minhash_sig",
    "q14_minhash_lsh_pairs",
    "q16_simhash",
    "q21_sessions",
    "q22_semantic_chunks",
    "q24_source_counts",
    # round-4: pin the converter mapInPandas path, the broadcast
    # decontamination join, and the map-side trap analytics so
    # regressions there surface in the bench, not only pytest
    "q49_docx_convert",
    "q53_contamination",
    "q55_trap_scores",
    "q59_pii_scrub",
    # round-5: pin the zero-shuffle Gopher filter pass, the unigram-LM
    # train+score join, and the duplicated-n-gram cover accounting
    "q65_gopher_filters",
    "q66_unigram_lm_score",
    "q70_dup_ngram_cover",
    # round-5b: pin the per-shard Arrow packing fold, the count-min
    # sketch build+broadcast estimate, and the zero-shuffle sniffer
    "q83_sequence_packing",
    "q86_cms_host_counts",
    "q88_content_sniff",
    # round-5c: pin the containment shingle join, the PQ literal-codebook
    # assignment (training loop included), and the normalize-then-hash
    # dedup aggregate
    "q91_containment_pairs",
    "q93_pq_codes",
    "q99_normalized_dedup",
    # round-5d: pin the zero-shuffle readability HOF fold, the
    # vocab-compacted BPE pair aggregate, and the broadcast-only IVF-PQ
    # ANN search (routing + ADC scoring)
    "q124_readability",
    "q125_bpe_pairs",
    "q127_ivf_pq_search",
    # round-5 closing: pin the OPIC iteration loop (checkpointed rank
    # state) and the DUST stripped-URL join
    "q173_opic",
    "q178_dust_rules",
    # round-5 continuation: pin the shared-partition CUSUM windows and
    # the with_global_seq AUC/AP rank machinery
    "q254_latency_drift",
    "q265_classifier_auc",
    # round-5 final batch: pin the BH-FDR host-table rank/cutoff pass
    # and the KM per-group survival windows
    "q285_fdr_hosts",
    "q288_page_survival",
]


def run_crawl_bench(spark, scale: str = "medium", max_pages: int = 30000):
    """Frontier-expansion throughput: multi-host whole-web crawl over the
    synthetic corpus; throughput = URLs fetched+extracted / sec."""
    from pyspark.sql import functions as F

    from eget_spark.plans.crawl import CrawlConfig, crawl
    from eget_spark.synth import SCALES, build_docs, doc_url

    docs = build_docs(spark, scale, n_partitions=64).persist()
    docs.count()  # materialize generation outside the timed section
    spec = SCALES[scale]
    seeds = [doc_url(i, 0) for i in range(spec.n_hosts)]

    # warmup: a tiny crawl through the same code path, so one-time costs
    # (python worker pool spawn, codegen/JIT of every operator, broadcast
    # machinery) are excluded from steady-state throughput — on a real
    # cluster these are executor-startup costs, not per-crawl costs
    warm_cfg = CrawlConfig(
        seed_urls=seeds[:8],
        max_depth=2,
        max_pages=200,
        respect_robots_txt=False,
        restrict_domain=False,
    )
    warm = crawl(spark, docs, warm_cfg, robots=None)
    warm.pages.select(F.sum(F.length("markdown"))).collect()
    cfg = CrawlConfig(
        seed_urls=seeds,
        max_depth=10,
        max_pages=max_pages,
        respect_robots_txt=False,
        restrict_domain=False,
        use_bloom=os.environ.get("EGET_BENCH_BLOOM", "0") == "1",
    )

    def timed_crawl() -> dict:
        t0 = time.monotonic()
        res = crawl(spark, docs, cfg, robots=None)
        # force full extraction (markdown assembly) — part of the metric
        res.pages.select(F.sum(F.length("markdown"))).collect()
        wall = time.monotonic() - t0
        attempted = sum(s.attempted for s in res.stats)
        # per-round detail: lets the scaling harness separate the BFS
        # ramp (rounds whose frontier is still tiny — fixed job-latency
        # cost at any parallelism) from steady-state rounds, which are
        # what a 10^10-URL crawl spends ~100% of its life in
        detail = [
            {
                "round": s.round,
                "attempted": s.attempted,
                "dur": round(s.duration_sec, 3),
            }
            for s in res.stats
        ]
        return {
            "wall_sec": round(wall, 3),
            "urls_attempted": attempted,
            "rounds": len(res.stats),
            "urls_per_sec": round(attempted / wall, 2),
            "rounds_detail": detail,
        }

    # min-per-rep within the attempt (round-4 lesson, same medicine the
    # scaling harness takes): a single ~25 s crawl measurement is exposed
    # to one-sided neighbor noise; repeat it and keep the quietest run
    reps = max(1, int(os.environ.get("EGET_BENCH_CRAWL_REPS", "3")))
    runs = [timed_crawl() for _ in range(reps)]
    docs.unpersist()
    best = min(runs, key=lambda r: r["wall_sec"])
    best["reps"] = reps
    best["rep_walls"] = [r["wall_sec"] for r in runs]
    return best


def calibrate(cpus: int) -> dict:
    """Fixed CPU workload timings — context for cross-round comparisons on
    a shared host (this VM shows ±30%+ wall variance under neighbor load;
    see BENCH/BASELINE.md).  t1 = single-thread seconds, mt = the same
    total work spread over `cpus` threads (ideal mt == t1/cpus)."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    def unit(seed: int) -> str:
        # blake2b releases the GIL on large buffers and uses exactly one
        # core — unlike numpy matmul, whose BLAS threads would contaminate
        # the single-thread measurement
        buf = bytes([seed & 0xFF]) * (8 << 20)
        h = hashlib.blake2b()
        for _ in range(8):
            h.update(buf)
        return h.hexdigest()

    t0 = time.monotonic()
    for s in range(4):
        unit(s)
    t1 = time.monotonic() - t0
    # min of 2 warm trials on ONE pool: a cold ThreadPoolExecutor's spawn
    # + first-touch page faults add ~0.2 s to trial 1 even on an idle
    # host, which would read as phantom contention
    with ThreadPoolExecutor(max_workers=cpus) as ex:
        mt = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            list(ex.map(unit, range(cpus)))
            mt = min(mt, time.monotonic() - t0)
    return {"t1_4units_sec": round(t1, 3), "mt_1unit_each_sec": round(mt, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    calib = calibrate(cpus)

    import __spark_entry__ as entry
    from eget_spark.session import get_spark

    spark = get_spark(app_name="eget_bench", cores=cpus, shuffle_partitions=max(cpus, 16))

    # session warmup: JVM/codegen/parquet-reader/python-worker startup are
    # executor-boot costs on a real cluster, not per-query costs — exclude
    # them from headline timings (same rationale as the crawl warmup below)
    from pyspark.sql import functions as F

    warm = spark.read.parquet(f"{sf_dir}/documents.parquet")
    warm.join(warm.select("doc_id").limit(10), "doc_id").select(
        F.sum(F.length("text"))
    ).collect()

    qs = entry.queries()

    def run_suite() -> tuple[dict, dict]:
        timings: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.count()
            timings[name] = round(time.monotonic() - t0, 3)
        return timings, run_crawl_bench(spark)

    def quiet(c: dict, t1_ref: float) -> bool:
        # quiet threshold 3x the single-thread unit: this host exposes 32
        # SMT threads over 16 physical cores, so even fully idle, 32
        # compute-bound threads run at ~2.0-2.2x the single-thread unit
        # time (measured floor 0.22 s vs unit 0.109 s); 3x allows that SMT
        # halving plus scheduler jitter while still rejecting the ~10-of-32
        # -cores oversubscription that polluted the round-2 record
        # (round-2 verdict: a number that needs apologetics is a weak
        # artifact — re-measure instead).  t1_ref is the MIN single-thread
        # time across attempts — contention inflates an attempt's own t1,
        # which would otherwise raise its own bar and self-certify.
        return c["mt_1unit_each_sec"] <= 3.0 * t1_ref / 4

    # min-of-N with a contention gate: rerun (<=3 attempts) until the
    # calibration probe shows a quiet host, then record per-query minima
    # across attempts (noise is one-sided: contention only ever inflates)
    max_attempts = int(os.environ.get("EGET_BENCH_ATTEMPTS", "3"))
    min_attempts = min(2, max_attempts)
    attempts: list[tuple[dict, dict, dict]] = []  # (calib, timings, crawl)

    def bracketed(pre: dict) -> tuple[dict, dict, dict]:
        # calibrate BEFORE and AFTER the suite, keep the quieter probe:
        # bursty neighbor load can hit one probe but not the measured run,
        # and attributing a loud probe to a quiet run mislabels the record
        t, c = run_suite()
        post = calibrate(cpus)
        best = min(pre, post, key=lambda x: x["mt_1unit_each_sec"])
        best = dict(best)
        best["t1_4units_sec"] = min(
            pre["t1_4units_sec"], post["t1_4units_sec"]
        )
        return best, t, c

    attempts.append(bracketed(calib))

    def t1_ref() -> float:
        return min(c["t1_4units_sec"] for c, _, _ in attempts)

    while len(attempts) < max_attempts and (
        len(attempts) < min_attempts
        or not any(quiet(c, t1_ref()) for c, _, _ in attempts)
    ):
        attempts.append(bracketed(calibrate(cpus)))

    best_q: dict[str, float] = {
        name: min(t[name] for _, t, _ in attempts) for name in HEADLINE
    }
    best_calib, _, best_crawl = min(attempts, key=lambda a: a[2]["wall_sec"])
    timings = dict(best_q)
    timings["crawl_frontier"] = best_crawl["wall_sec"]

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline query wall time + frontier-expansion throughput",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "crawl": best_crawl,
        "cpus": cpus,
        "calib": best_calib,
        "attempts": len(attempts),
        "calibs": [c for c, _, _ in attempts],
        "host_quiet": quiet(best_calib, t1_ref()),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
