"""Fresh-process replica of the driver's correctness gate.

Runs EVERY query declared by ``__spark_entry__.queries()`` against its
``oracle_sql()`` twin on DuckDB at the given scale factor, with the
driver's order-insensitive compare (columns sorted by name, floats at
%.9g). Queries with no oracle get a rows-only check (runs clean, >= 0
rows, stable schema).

Usage:
    python tools/oracle_sweep.py [sf_dir]       # default /root/testdata/sf0.01
    python tools/oracle_sweep.py --only a,b,c   # subset while iterating
    python tools/oracle_sweep.py --smoke        # CALL every registered fn
                                                # (plan build only, no
                                                # execution) — catches
                                                # mis-registered callables
                                                # (wrong signature / missing
                                                # column) in seconds; run it
                                                # after EVERY commit

Exit code 0 iff every query passes. Prints one status line per query and
a JSON summary line at the end, so rounds can diff registry visibility
(VERDICT r2 item 1: every declared query must be driver-visible green).
"""

from __future__ import annotations

import importlib.util
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    smoke = "--smoke" in args
    if smoke:
        args.remove("--smoke")
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # --stress-partitions: force many tiny input splits so every scan
    # arrives multi-partition — the lane that exposed the round-7
    # assign_dense_ids range-boundary bug registry-wide
    mpb = os.environ.get("SWEEP_MAX_PARTITION_BYTES")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SWEEP_SHUFFLE_PARTITIONS", "8"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", mpb or "134217728")
        .config("spark.sql.files.openCostInBytes", "0" if mpb else "4194304")
        .getOrCreate()
    )

    from meerpipe_spark.io import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'")

    queries = mod.queries()
    oracles = mod.oracle_sql()
    passed, rows_only, failed = [], [], []
    from meerpipe_spark.cacheutil import release_checkpoints, release_persisted

    for name, fn in queries.items():
        if only is not None and name not in only:
            continue
        # free the previous query's operator-internal caches (LSH bands,
        # semdedup assignment) and orphaned localCheckpoint blocks (the
        # iterative graph ops) before timing the next one — a 190-query
        # session otherwise accumulates blocks until the heap dies
        release_persisted()
        release_checkpoints(spark)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            if smoke:
                # plan construction alone proves the registered callable
                # has the (spark, sf_dir) signature and a resolvable plan
                passed.append(name)
                print(f"SMOKE {name}: {len(spark_cols)} cols ({time.time()-t0:.1f}s)")
                continue
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            rows_only.append(name)
            print(f"ROWS  {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(sql)
            duck_cols = [d[0].lower() for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            failed.append(name)
            print(f"FAIL  {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            continue
        if len(spark_rows) != len(duck_rows):
            failed.append(name)
            print(f"FAIL  {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            continue
        s = _normalize(spark_rows, spark_cols)
        d = _normalize(duck_rows, duck_cols)
        mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
        if mism:
            failed.append(name)
            print(f"FAIL  {name}: {len(mism)} mismatched rows; first spark={s[mism[0]]} duck={d[mism[0]]}")
            continue
        passed.append(name)
        print(f"PASS  {name}: {len(spark_rows)} rows hash-match ({time.time()-t0:.1f}s)")

    print(json.dumps({
        "sf_dir": sf_dir,
        "declared": len(queries),
        "oracle_pass": len(passed),
        "rows_only": len(rows_only),
        "failed": failed,
    }))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
