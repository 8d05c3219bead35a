"""Count-min sketch: sublinear heavy-hitter counting for crawl frontiers.

Frontier admission wants "is this host suddenly hot?" without keeping an
exact per-host counter table (hosts are unbounded; a 10^10-URL frontier
sees hundreds of millions).  A count-min sketch answers frequency queries
with a fixed depth x width integer grid: cell (j, b) holds the count of
every key whose j-th hash lands in bucket b, and a key's estimate is the
MIN over its depth cells — always an overestimate, within eps*N with
probability 1-delta for width=ceil(e/eps), depth=ceil(ln 1/delta).

Engine-portable determinism: hash j of a key is the repo-standard 60-bit
md5 prefix of ``"j:" || key`` (same recipe as operators/hll.py), so the
sketch — not just the estimates — is bit-identical in Spark and the SQL
oracle.

Scale shape: the build is one 4x explode + hash aggregation into
depth*width cells — map-side partial aggregation collapses each task's
contribution to <=depth*width rows before the (tiny) shuffle, so the
sketch costs about one scan regardless of input size.  Estimation
broadcast-joins the few-hundred-row sketch back to the distinct keys; no
shuffle of the big side.  Sketches from disjoint corpora merge by cell-wise
addition (groupBy (j, bucket) sum) — the property that makes CMS the
standard streaming/partitioned counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, j: int, width: int):
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 15), 16, 10
    ).cast("long")
    return (h % width).cast("long")


def build_cms(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """One sketch cell per row: (j, bucket, c) — at most depth*width rows."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.j", "cell.bucket").agg(
        F.count("*").cast("long").alias("c")
    )


def cms_counts(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """(key, exact_n, cms_n) for every distinct key: the exact count next
    to the sketch estimate (cms_n >= exact_n always; equality when no
    collision in at least one row).  The exact side exists for
    verification/calibration — production callers keep only the sketch."""
    sketch = build_cms(df, key_col, depth, width)
    keys = df.groupBy(key_col).agg(F.count("*").cast("long").alias("exact_n"))
    probes = keys.select(
        F.col(key_col),
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return (
        probes.join(
            F.broadcast(sketch),
            (probes["cell.j"] == sketch["j"])
            & (probes["cell.bucket"] == sketch["bucket"]),
        )
        .groupBy(key_col, "exact_n")
        .agg(F.min("c").alias("cms_n"))
    )


def cms_probe_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(key, cms_n) for every row of ``keys``: the min-over-depth probe
    of an ALREADY-BUILT sketch — the estimation half of
    :func:`cms_counts`, split out so the streaming maintainer
    (streaming/cms.py) can run drained state through the exact same
    arithmetic the batch operator uses (the hll.py
    ``hll_estimates_from_regs`` pattern).  Broadcast-joins the
    <=depth*width-row sketch; the big side never shuffles."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return (
        probes.join(
            F.broadcast(sketch),
            (probes["cell.j"] == sketch["j"])
            & (probes["cell.bucket"] == sketch["bucket"]),
        )
        .groupBy(key_col)
        .agg(F.min("c").alias("cms_n"))
    )
