#!/usr/bin/env python3
"""Capture the PER-ROUND physical plan of the iterative graph lanes.

Their returned DataFrames are checkpoint scans (the loop's work hides
in eager localCheckpoint jobs), so ``explain`` on the lane output shows
an ExistingRDD and nothing else. This tool monkeypatches
``DataFrame.localCheckpoint`` to identity, rebuilds the lane lazily,
and explains the FULL unrolled lineage — every round's join strategy
(SortMergeJoin vs BroadcastHashJoin) becomes visible. Plan capture
only; nothing is executed, and the patch never leaves this process.

Usage: python tools/iterplan_r13.py TAG lane1,lane2 [sf_dir]
Writes plans/r13/<lane>_iteration_<TAG>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # Spark 4: the classic session returns the subclass, whose
    # localCheckpoint overrides the pyspark.sql.DataFrame base method
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # Spark 3.x
    from pyspark.sql import DataFrame

from meerpipe_spark.queries import QUERIES
from meerpipe_spark.session import get_spark

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r13")


def main() -> int:
    tag = sys.argv[1]
    lanes = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="iterplan_r13")

    orig = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, *a, **kw: self  # type: ignore
    try:
        for name in lanes:
            try:
                df = QUERIES[name].fn(spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception as exc:
                plan = f"CAPTURE FAILED: {type(exc).__name__}: {exc}"
            path = os.path.join(OUT_DIR, f"{name}_iteration_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            smj = plan.count("SortMergeJoin")
            bhj = plan.count("BroadcastHashJoin")
            ex = plan.count("Exchange")
            print(f"{name}: Exchange={ex} SMJ={smj} BHJ={bhj} -> {path}",
                  flush=True)
    finally:
        DataFrame.localCheckpoint = orig  # type: ignore
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
