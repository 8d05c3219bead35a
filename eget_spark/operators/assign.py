"""Rendezvous (highest-random-weight) fetcher-fleet assignment.

Training-data-pipeline extension (not a reference operator): the reference
is a single-process crawler (queue_manager.py holds one in-memory frontier),
so "which fetcher owns this host" never arises.  A distributed crawler MUST
pin each host to exactly one fetcher worker — politeness (per-host
crawl-delay, robots cache, connection reuse) is only enforceable if all of
a host's fetches go through one place.  The standard scheme is rendezvous
hashing (Thaler & Ravishankar 1996, the precursor of consistent hashing
used by Akamai/memcached routers): ``owner(host) = argmax_w
hash(host ‖ w)``.  Its killer property for a long-running crawl fleet:
resizing from k to k+1 workers moves ONLY the hosts whose new argmax is the
new worker (expected n/(k+1)) — every other host keeps its owner, so robots
caches and politeness clocks survive a fleet resize.

Scale shape — the whole point of the formulation here:
- assignment is a PURE PROJECTION: the worker list is a literal array and
  the argmax is a higher-order ``aggregate`` fold over it, so there is NO
  worker table, NO join, NO explode, NO shuffle — any executor can compute
  any host's owner locally from the host string alone (exactly how a real
  fetcher admits work: hash, compare to its own id, skip or fetch);
- the hash is the repo-standard portable md5 60-bit integer, so the
  assignment is bit-identical across engines, retries, and partitionings
  (and oracle-checkable in plain SQL);
- churn analysis is one distinct compaction + one map-side-combined
  groupBy on (worker_a, worker_b) — |workers|^2 output rows.

Pinned semantics: owner = the worker with the LARGEST
``md5_60bit(host || '|' || worker)``; ties (2^-60 events) break to the
LARGEST worker label, so the argmax is total and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kmv import md5_60bit


def rendezvous_owner(host: Column, workers: list[str]) -> Column:
    """Column expression: the rendezvous owner of ``host`` among
    ``workers`` (non-empty list of distinct labels).  Zero-shuffle —
    a fold over a literal array."""
    if not workers:
        raise ValueError("workers must be non-empty")
    arr = F.array(*[F.lit(w) for w in sorted(set(workers))])
    init = F.struct(
        F.lit(-1).cast("long").alias("w"), F.lit("").alias("k")
    )

    def merge(acc: Column, x: Column) -> Column:
        wt = md5_60bit(F.concat(host, F.lit("|"), x))
        better = (wt > acc["w"]) | ((wt == acc["w"]) & (x > acc["k"]))
        return F.when(better, F.struct(wt.alias("w"), x.alias("k"))).otherwise(
            acc
        )

    return F.aggregate(arr, init, merge, lambda acc: acc["k"])


def rendezvous_assign(
    df: DataFrame,
    host_col: str,
    workers: list[str],
    out_col: str = "worker",
) -> DataFrame:
    """``df`` + ``out_col`` = rendezvous owner of ``host_col``.  Pure
    projection (no shuffle, no join): at 10^10 URLs there is no
    assignment table to materialize or look up — ownership is a
    deterministic function of the host string."""
    return df.withColumn(out_col, rendezvous_owner(F.col(host_col), workers))


def assignment_churn(
    hosts: DataFrame,
    host_col: str,
    workers_a: list[str],
    workers_b: list[str],
) -> DataFrame:
    """Fleet-resize churn matrix: distinct hosts are assigned under both
    fleets IN THE SAME PROJECTION (two folds per row, still zero joins),
    then one map-side groupBy counts each (worker_a, worker_b) flow.
    Rendezvous guarantees: for a pure grow (workers_b ⊃ workers_a) every
    off-diagonal row has ``worker_b`` ∈ the added workers.

    Returns (worker_a, worker_b, n_hosts, moved).
    """
    h = hosts.select(host_col).distinct()
    both = h.select(
        rendezvous_owner(F.col(host_col), workers_a).alias("worker_a"),
        rendezvous_owner(F.col(host_col), workers_b).alias("worker_b"),
    )
    return both.groupBy("worker_a", "worker_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts")
    ).withColumn("moved", F.col("worker_a") != F.col("worker_b"))
