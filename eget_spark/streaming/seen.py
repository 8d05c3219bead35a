"""Stateful streaming URL-seen (D1 as a Structured-Streaming operator).

The batch engine's seen set is a bloom + anti-join (operators/seen.py);
for *continuous* ingestion (a discovered-URL stream) the same first-seen-
wins semantics become a keyed stateful operator: ``applyInPandasWithState``
grouped by host, state = the host's seen set. Each micro-batch emits only
URLs never seen in any earlier batch — exactly-once discovery across
restarts (state lives in the query checkpoint).

Scale notes:
- state is keyed by host, so it shards with the stream's host partitioning
  and hot hosts don't serialize the cluster — the same axis-B answer as
  the batch politeness/seen design;
- state per host is the exact URL array here (correctness first — a bloom
  in state would drop false-positive URLs with no anti-join to confirm);
  `max_state_urls` caps runaway hosts: beyond the cap new URLs pass
  through unfiltered and the overflow is flagged so a downstream batch
  anti-join (the exact path) can reconcile — never silently dropped.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("overflow", T.BooleanType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.StringType()))]
)


def _first_seen_fn(max_state_urls: int):
    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        seen = set(state.get[0]) if state.exists else set()
        out_urls: list[str] = []
        out_over: list[bool] = []
        for pdf in pdfs:
            for u in pdf["url"]:
                if u is None or u in seen:
                    continue
                if len(seen) >= max_state_urls:
                    out_urls.append(u)  # pass through, flag for reconcile
                    out_over.append(True)
                    continue
                seen.add(u)
                out_urls.append(u)
                out_over.append(False)
        state.update((sorted(seen),))
        if out_urls:
            yield pd.DataFrame(
                {"host": host, "url": out_urls, "overflow": out_over}
            )

    return fn


def stream_first_seen(
    urls: DataFrame, max_state_urls: int = 1_000_000
) -> DataFrame:
    """First-seen-wins over a streaming (host, url) DataFrame.

    Emits each URL exactly once per host across all micro-batches (state
    checkpointed with the query; restarts resume, never re-emit)."""
    return urls.groupBy("host").applyInPandasWithState(
        _first_seen_fn(max_state_urls),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
