#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() materializes the full
plan; results are never collected to the driver). A warmup pass JITs
whole-stage codegen and primes the parquet footer cache; each query is
then timed twice and the MINIMUM recorded (steady-state execution,
robust to CI-box load spikes — observed run-to-run noise up to 2× on
individual sub-second queries).

Fail-soft per query: a query that raises is recorded under "errors"
with its exception and EXCLUDED from the total, but never aborts the
run — one broken query must not zero the whole artifact (round-3
lesson: the NTZ regression killed the bench before a single timing).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from meerpipe_spark.queries import QUERIES, headline_queries
from meerpipe_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="meerpipe_spark_bench")
    names = headline_queries()

    # Warmup: run the cheapest query once to JIT codegen paths.
    try:
        QUERIES[names[0]].fn(spark, SF_DIR).count()
    except Exception:
        traceback.print_exc(file=sys.stderr)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                QUERIES[name].fn(spark, SF_DIR).count()
            except Exception as exc:  # fail soft: record, keep benching
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                traceback.print_exc(file=sys.stderr)
                break
            best = min(best, time.perf_counter() - t0)
        if name not in errors:
            timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
