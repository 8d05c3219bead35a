"""Generate a LOCAL, timing-only approximation of the driver's sf1.0
dataset (the driver's round-end MEASUREMENT escalated to sf=1.0, but
/root/testdata only ships sf<=0.1).

Schema + distribution shapes are profiled from /root/testdata/sf0.1 and
scaled 10x.  This data is used ONLY to time optimizations at the driver's
measurement scale — correctness is always gated on the shipped sf dirs via
tools/check_entry.py.  Never point the oracle gate here.

Usage: python tools/gen_sf_local.py /root/sf1local [scale]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()


def write(out_dir: str, name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {tbl.num_rows} rows")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1local"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    mul = scale / 0.1  # counts below are sf0.1 counts

    n_docs = int(5000 * mul)
    n_vecs = int(2000 * mul)
    n_events = int(100_000 * mul)
    n_li = int(600_000 * mul)
    n_ord = int(150_000 * mul)
    n_cust = int(15_000 * mul)
    n_part = int(20_000 * mul)
    n_supp = int(1000 * mul)

    # --- documents: 10-100 uniform words from the 30-word vocab, ~5% of
    # docs carry a rare 'dup' token, ~0.16% exact-duplicate pairs
    lens = rng.integers(10, 101, n_docs)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_docs):
        words = vocab[rng.integers(0, len(vocab), lens[i])]
        if rng.random() < 0.05:
            words = np.append(words, "dup")
        texts.append(" ".join(words))
    for _ in range(int(8 * mul)):  # exact duplicate pairs like the source
        a, b = rng.integers(0, n_docs, 2)
        texts[b] = texts[a]
    langs = rng.choice(
        np.array(["en", "zh", "es", "fr", "de"]),
        n_docs,
        p=[0.412, 0.15, 0.149, 0.148, 0.141],
    )
    sources = np.array([f"src{i}" for i in range(20)])[
        rng.integers(0, 20, n_docs)
    ]
    write(
        out_dir,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), pa.int64()),
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": pa.array(
                    np.array([len(t) for t in texts]), pa.int64()
                ),
            }
        ),
    )

    # --- embeddings: unit-norm 64-dim, weak label structure
    labels = rng.integers(0, 10, n_vecs)
    cents = rng.standard_normal((10, 64)).astype(np.float32)
    cents = 0.56 * cents / np.linalg.norm(cents, axis=1, keepdims=True)
    E = rng.standard_normal((n_vecs, 64)).astype(np.float32) / 8.0 + cents[labels]
    E = E / np.linalg.norm(E, axis=1, keepdims=True)
    write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
                "embedding": pa.array(list(E), pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )

    # --- events: 30 days, increasing ts, 5 types, value ~ exp-ish
    base = np.datetime64("2024-01-01T00:00:00.000000")
    ts = base + np.sort(
        rng.integers(0, 30 * 86400 * 1_000_000, n_events)
    ).astype("timedelta64[us]")
    write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_events), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, int(1500 * mul), n_events), pa.int64()
                ),
                "event_type": pa.array(
                    np.array(["view", "click", "signup", "purchase", "error"])[
                        rng.integers(0, 5, n_events)
                    ]
                ),
                "value": np.round(rng.exponential(50.0, n_events), 2),
                "props": pa.array(
                    [
                        '{"k": %d}' % k
                        for k in rng.integers(0, 100, n_events)
                    ]
                ),
            }
        ),
    )

    # --- star schema
    day = np.timedelta64(86400 * 1_000_000, "us")
    ship_base = np.datetime64("1995-01-01T00:00:00.000000")
    write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.integers(0, n_ord, n_li), pa.int64()
                ),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_li), pa.int32()
                ),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(
                    rng.uniform(900, 105000, n_li), 2
                ),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": pa.array(
                    ship_base + rng.integers(0, 2500, n_li) * day,
                    pa.timestamp("us"),
                ),
            }
        ),
    )
    write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": pa.array(
                    ship_base + rng.integers(0, 2400, n_ord) * day,
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    np.array(
                        [
                            "1-URGENT",
                            "2-HIGH",
                            "3-MEDIUM",
                            "4-NOT SPECIFIED",
                            "5-LOW",
                        ]
                    )[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )
    write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)]
                ),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": pa.array(
                    np.array(
                        [
                            "AUTOMOBILE",
                            "BUILDING",
                            "FURNITURE",
                            "HOUSEHOLD",
                            "MACHINERY",
                        ]
                    )[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )
    adj = ["large", "hot", "small", "cold", "fast", "slow", "new", "old"]
    noun = ["ring", "bolt", "case", "drum", "pipe", "disk", "gear", "cap"]
    write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": pa.array(
                    [
                        f"{adj[i % 8]} {noun[(i // 8) % 8]}"
                        for i in range(n_part)
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{i % 25 + 1}" for i in range(n_part)]
                ),
                "p_type": pa.array(
                    np.array(
                        [
                            "LARGE",
                            "ECONOMY",
                            "STANDARD",
                            "SMALL",
                            "MEDIUM",
                            "PROMO",
                        ]
                    )[rng.integers(0, 6, n_part)]
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(
                    900.0 + (np.arange(n_part) % 1000) / 10.0, 1
                ),
            }
        ),
    )
    write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)]
                ),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            }
        ),
    )
    write(
        out_dir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
            }
        ),
    )
    write(
        out_dir,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
                ),
            }
        ),
    )


if __name__ == "__main__":
    main()
