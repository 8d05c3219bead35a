"""Local emulation of the driver's correctness gate: run each
__spark_entry__ query via Spark AND its oracle via DuckDB on the same
parquet dir, compare row count, column names, and exact sorted values.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from eget_spark.session import get_spark

    spark = get_spark(app_name="check_entry", cores=8, shuffle_partitions=16)

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"{name}: rows={len(got)} (no oracle; rows-only) [{t_spark:.1f}s]")
            continue
        t0 = time.monotonic()
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        t_duck = time.monotonic() - t0
        ok, msg = compare(got, want)
        status = "OK" if ok else "MISMATCH"
        if not ok:
            failures += 1
        print(f"{name}: {status} rows={len(got)} {msg} [spark {t_spark:.1f}s, duck {t_duck:.1f}s]")
    spark.stop()
    return 1 if failures else 0


def compare(got: pd.DataFrame, want: pd.DataFrame) -> tuple[bool, str]:
    if sorted(got.columns) != sorted(want.columns):
        return False, f"columns {sorted(got.columns)} vs {sorted(want.columns)}"
    if len(got) != len(want):
        return False, f"row count {len(got)} vs {len(want)}"
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    w = want[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            ga = gv.astype(float).to_numpy()
            wa = wv.astype(float).to_numpy()
            bad = ~(np.isclose(ga, wa, rtol=0, atol=0) | (np.isnan(ga) & np.isnan(wa)))
            if bad.any():
                i = int(np.argmax(bad))
                return False, f"col {c} differs at sorted row {i}: {ga[i]!r} vs {wa[i]!r}"
        else:
            if not gv.astype(str).equals(wv.astype(str)):
                diff = (gv.astype(str) != wv.astype(str)).idxmax()
                return False, f"col {c} differs at sorted row {diff}: {gv[diff]!r} vs {wv[diff]!r}"
    return True, ""


if __name__ == "__main__":
    raise SystemExit(main())
