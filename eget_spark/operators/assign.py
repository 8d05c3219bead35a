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


def fleet_load(
    hosts: DataFrame,
    host_col: str,
    workers: list[str],
    pages_col: str = "n_pages",
    delay_col: str = "delay_ms",
    fetch_ms: int = 50,
) -> DataFrame:
    """Projected per-fetcher load under rendezvous ownership — the
    capacity-planning composition of :func:`rendezvous_owner` with the
    politeness-span arithmetic of
    :func:`~eget_spark.operators.politeness.makespan_bound`: each host
    contributes its serial span ``n*fetch_ms + (n-1)*delay_ms`` to the
    worker that owns it.

    Returns one row per worker: (worker, n_hosts, n_fetches,
    total_fetch_ms, max_span_ms, serial_ms) where ``serial_ms`` = sum of
    owned spans (the worker's wall time if it politely fetched hosts one
    after another) and ``max_span_ms`` = the longest single span (its
    wall time with unlimited per-host concurrency).  A fleet is
    host-skew-bound when one worker's max_span dwarfs the rest — the
    signal to split that host across crawl snapshots.

    Scale shape: ownership is the zero-shuffle HRW fold; the ONLY
    shuffle is the |workers|-key groupBy (map-side combined).  Workers
    with no hosts are absent (join the fleet list back if a dense report
    is needed).
    """
    n = F.col(pages_col).cast("long")
    d = F.col(delay_col).cast("long")
    span = n * F.lit(int(fetch_ms)) + (n - F.lit(1)) * d
    owned = hosts.select(
        rendezvous_owner(F.col(host_col), workers).alias("worker"),
        n.alias("_n"),
        span.alias("_span"),
    )
    return owned.groupBy("worker").agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.sum("_n").cast("long").alias("n_fetches"),
        (F.sum("_n") * F.lit(int(fetch_ms))).cast("long").alias("total_fetch_ms"),
        F.max("_span").cast("long").alias("max_span_ms"),
        F.sum("_span").cast("long").alias("serial_ms"),
    )


def snake_pack(
    items: DataFrame,
    weight_col: str,
    k: int,
    id_col: str | None = None,
) -> DataFrame:
    """Snake (boustrophedon) packing of weighted items onto ``k`` workers
    — the deterministic load balancer for WHOLE-GROUP placement, where
    rendezvous hashing does not apply because the unit is a weighted
    group (an LPA community, a dedup cluster) that must land on ONE
    worker but groups differ wildly in size.  Items ranked by (weight
    DESC, id ASC) are dealt in alternating direction — round r sends
    rank positions left-to-right, round r+1 right-to-left — the classic
    seeding scheme (sports brackets, LPT-style makespan heuristics):
    each worker's ranks sum to a near-equal arithmetic mix of heavy and
    light items, bounding the load gap by one item's weight per pair of
    rounds without any sequential bin-packing loop.

    Output: one row per item — (id, weight, rank, worker).

    Scale shape: the global rank is the range-exchange sequencer
    (operators/sequence.with_global_seq — never a single-partition
    window; millions of communities rank in parallel); the snake is pure
    per-row modular arithmetic in codegen — no join, no Python."""
    from .sequence import with_global_seq

    idc = F.col(id_col if id_col is not None else items.columns[0])
    base = items.select(
        idc.alias("id"), F.col(weight_col).cast("long").alias("weight")
    )
    # rank by weight DESC: sequence on (-weight, id)
    ranked = with_global_seq(
        base.withColumn("_negw", -F.col("weight")),
        ["_negw", "id"],
        seq_col="_rank",
    ).df
    rnd = F.floor(F.col("_rank") / k)
    pos = F.col("_rank") % k
    worker = F.when(rnd % 2 == 0, pos).otherwise(F.lit(k - 1) - pos)
    return ranked.select(
        "id",
        "weight",
        (F.col("_rank") + 1).cast("long").alias("rank"),
        worker.cast("int").alias("worker"),
    )


def _md5_60bit_py(s: str) -> int:
    """Driver-side mirror of :func:`eget_spark.operators.kmv.md5_60bit`
    (15 hex chars of md5 as an int) — ring point positions are computed
    once on the driver and embedded as literals, so both engines only
    ever hash the HOST at runtime."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def ring_points(workers: list[str], vnodes: int = 16) -> list[tuple[int, str]]:
    """The consistent-hash ring (Karger et al. STOC'97 / the Dynamo
    partitioning scheme, DeCandia et al. SOSP'07 §4.2): each worker
    plants ``vnodes`` virtual points at ``md5_60bit(worker || '#' || v)``
    and owns the arc ending at each point.  Sorted ascending; position
    collisions (2^-60 events) break to the SMALLER worker label (the
    first point at that position wins the successor scan) so the ring
    is total and engine-independent."""
    if not workers or vnodes < 1:
        raise ValueError("workers must be non-empty and vnodes >= 1")
    return sorted(
        (_md5_60bit_py(f"{w}#{v}"), w)
        for w in sorted(set(workers))
        for v in range(vnodes)
    )


def ring_owner(host: Column, workers: list[str], vnodes: int = 16) -> Column:
    """Column expression: the ring owner of ``host`` — the worker whose
    virtual point is the clockwise successor of ``md5_60bit(host)``
    (wrapping past the top of the ring to the first point).

    Complements :func:`rendezvous_owner`: rendezvous recomputes one hash
    per (host, worker) — O(|workers|) per row — while the ring hashes
    the host ONCE and walks literal boundaries, O(log points) as a
    balanced CASE tree; at fleet sizes in the hundreds both are
    projection-only, but the ring also gives the operator a knob
    (``vnodes``) trading assignment smoothness against expression size.
    Like rendezvous, resizing moves only the arcs adjacent to the
    added/removed worker's points — politeness clocks and robots caches
    survive a fleet resize.

    Scale shape: the ring is |workers|*vnodes LITERALS baked into a
    nested half-interval CASE tree (depth log2(points)) — NO worker
    table, NO join, NO shuffle; any executor computes any host's owner
    locally.  Keep points (workers*vnodes) in the low thousands — it is
    an expression, not data; a 10^5-worker fleet should bucket-join a
    broadcast ring table instead."""
    pts = ring_points(workers, vnodes)
    h = md5_60bit(host)

    def build(lo: int, hi: int) -> Column:
        # owner for h in (pts[lo-1].pos, pts[hi].pos] by binary split
        if lo == hi:
            return F.lit(pts[lo][1])
        mid = (lo + hi) // 2
        return F.when(h <= F.lit(pts[mid][0]), build(lo, mid)).otherwise(
            build(mid + 1, hi)
        )

    # successor of h, wrapping: h beyond the last point -> first point
    return F.when(h > F.lit(pts[-1][0]), F.lit(pts[0][1])).otherwise(
        build(0, len(pts) - 1)
    )


def ring_assign(
    df: DataFrame,
    host_col: str,
    workers: list[str],
    vnodes: int = 16,
    out_col: str = "worker",
) -> DataFrame:
    """``df`` + ``out_col`` = ring owner of ``host_col``.  Pure
    projection (plan-pinned like rendezvous_assign)."""
    return df.withColumn(out_col, ring_owner(F.col(host_col), workers, vnodes))
