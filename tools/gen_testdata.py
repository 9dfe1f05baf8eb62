#!/usr/bin/env python3
"""Deterministic miniature testdata generator (CI bootstrap).

Produces the same 10-table parquet layout the round driver ships
(TESTDATA.md: region nation customer supplier part orders lineitem
events documents embeddings) with matching schemas and value domains,
sized like sf0.001 by default, so a clean container can run the full
pytest suite and the oracle sweep without any externally provided data.

Pure numpy/pyarrow — no Spark session needed, fully seeded (the same
invocation always writes byte-stable content modulo parquet metadata).

Usage: python tools/gen_testdata.py [out_dir] [scale]
Defaults: .ci_testdata 1.0   (scale 1.0 == sf0.001-equivalent row counts)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "the fast key order sort table scan merge part window small hash "
    "join batch stream spark dup filter group agg shuffle broadcast "
    "cache plan row column page split token index range"
).split()

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "STANDARD", "PROMO", "LARGE", "SMALL"]
PNAMES = ["cold", "hot", "dark", "light", "deep"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "fr", "de", "es", "zh"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _ts_us(base_days: float, spread_days: float, rng, n: int, epoch: str) -> pa.Array:
    base = np.datetime64(epoch, "us")
    offs = (base_days + rng.random(n) * spread_days) * 86400e6
    return pa.array(base + offs.astype("timedelta64[us]"), type=pa.timestamp("us"))


def generate(out_dir: str, scale: float = 1.0, seed: int = 20260814) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = max(25, int(150 * scale))
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }))

    n_supp = max(5, int(10 * scale))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    n_part = max(25, int(200 * scale))
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{PNAMES[i % 5]} widget" for i in rng.integers(0, 5, n_part)
        ],
        "p_brand": [f"Brand#{1 + int(i)}" for i in rng.integers(0, 25, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 5, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2100.0, n_part), 2),
    }))

    n_ord = max(100, int(1500 * scale))
    okey = np.arange(n_ord, dtype=np.int64)
    odate_off = rng.integers(0, 2400, n_ord)
    write("orders", pa.table({
        "o_orderkey": okey,
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": [("POF")[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900.0, 400000.0, n_ord), 2),
        "o_orderdate": pa.array(
            np.datetime64("1995-01-01", "us")
            + (odate_off * 86400e6).astype("timedelta64[us]"),
            pa.timestamp("us"),
        ),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    }))

    lines_per = rng.integers(1, 8, n_ord)
    lkey = np.repeat(okey, lines_per)
    n_li = len(lkey)
    lnum = np.concatenate([np.arange(1, c + 1) for c in lines_per])
    ship_off = np.repeat(odate_off, lines_per) + rng.integers(1, 120, n_li)
    write("lineitem", pa.table({
        "l_orderkey": lkey,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [("NAR")[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [("FO")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            np.datetime64("1995-01-01", "us")
            + (ship_off * 86400e6).astype("timedelta64[us]"),
            pa.timestamp("us"),
        ),
    }))

    n_ev = max(200, int(1000 * scale))
    write("events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts_us(0.0, 30.0, rng, n_ev, "2024-01-01"),
        "user_id": rng.integers(0, max(2, n_ev // 65), n_ev).astype(np.int64),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
        # log-uniform like the driver data (median ~3, tail to 350):
        # keeps >180 purchases RARE so per-user conversion is non-degenerate
        "value": np.round(np.exp(rng.uniform(np.log(0.03), np.log(350.0), n_ev)), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    n_doc = max(100, int(500 * scale))
    texts = [
        " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), int(rng.integers(8, 40))))
        for _ in range(n_doc)
    ]
    write("documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, n_doc)],
        "source": [f"src{int(i)}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_vec = max(100, int(500 * scale))
    labels = rng.integers(0, 10, n_vec)
    centers = rng.normal(0, 1, (10, 64))
    vecs = centers[labels] + rng.normal(0, 0.3, (n_vec, 64))
    write("embeddings", pa.table({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": pa.array(
            [row.astype(np.float32) for row in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else ".ci_testdata"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    generate(out, scale)
    print(f"wrote 10 tables to {out} (scale {scale})")
