#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing one by unioning K
key-shifted copies of every table (VERDICT r2 #2: the sf0.1 bench is
fixed-cost dominated, so plan regressions are invisible — an sf1.0 run
is needed to see which queries leave the fixed-cost regime).

Key relationships are preserved copy-by-copy (order/part/supp/cust keys
all shift by copy_index * (max_key + 1), so joins land exactly as in the
source data); dimension tables (region, nation) are copied once;
documents get a per-copy token appended (realistic near-duplicates, not
byte-identical boilerplate); events shift user/event ids so per-user
session lengths stay constant while the user population scales.

Usage: python tools/make_scale_data.py [src_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1 .scale/sf1.0 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from meerpipe_spark.io import TABLES
from meerpipe_spark.session import get_spark

# key columns shifted per copy, per table (dims without entries copy once)
SHIFT_KEYS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def scale_table(df: DataFrame, name: str, factor: int) -> DataFrame:
    keys = SHIFT_KEYS.get(name)
    if not keys:
        return df  # dimension: one copy
    offsets = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
    copies = []
    for i in range(factor):
        c = df
        for k, off in offsets.items():
            c = c.withColumn(k, (F.col(k) + i * off).cast(df.schema[k].dataType))
        if name == "documents" and i > 0:
            # near-duplicate, not byte-identical: one token differs
            c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" v{i}")))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1.0"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="make_scale_data")
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        # raw read (no ts fix-up): the written file keeps ts as int64
        # nanos, which io.load_tables converts exactly like the source
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        out = scale_table(df, t, factor)
        n_files = max(1, min(8, out.rdd.getNumPartitions()))
        out.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )
        print(f"{t}: {out.count()} rows -> {dst}/{t}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
