#!/usr/bin/env python3
"""Round-13 optimization profiler (guide §1): for each requested lane,
build the DataFrame, save ``explain('formatted')`` under plans/r13/,
and time the computation against the noop sink (best-of-N in ONE
session, tracked caches released between lanes, calibration bracketed
so a loaded box is recognizable).

Timing note vs bench.py: bench times ``fn(...).count()`` which lets the
optimizer prune the final projection; the noop sink materializes every
column (guide §1.4). Both numbers are recorded here (noop primary).
The build phase (any driver-side collects inside fn) is timed
separately as ``build_sec`` so lanes whose cost is in training collects
(pq_train, ALS) attribute time to the right phase.

Usage:
    python tools/profile_r13.py --only a,b,c [--tag before] [--reps 3]
    python tools/profile_r13.py --top 25     # 25 slowest by r12 local bench
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meerpipe_spark.cacheutil import release_checkpoints, release_persisted
from meerpipe_spark.queries import QUERIES, headline_queries
from meerpipe_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def _calibrate(spark) -> float:
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 100_000_000, 1, 32)
            .select(F.xxhash64("id").alias("h"))
            .agg(F.sum(F.col("h") % 1000), F.avg(F.col("h") % 1000)).collect()
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    args = list(sys.argv[1:])
    only, tag, reps, top = None, "before", 3, None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        del args[i:i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    if "--top" in args:
        i = args.index("--top")
        top = int(args[i + 1])
        del args[i:i + 2]

    if top is not None:
        with open(os.path.join(os.path.dirname(PLANS_DIR), "..", "BENCH_local_r12_run1.json")) as f:
            q = json.load(f)["queries"]
        only = [n for n, _ in sorted(q.items(), key=lambda kv: -kv[1])[:top]]
    if not only:
        only = headline_queries()

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark(app_name="profile_r13")
    sc = spark.sparkContext

    # warmup: JIT codegen + parquet footer cache on the cheapest lane
    try:
        QUERIES[headline_queries()[0]].fn(spark, SF_DIR).count()
    except Exception:
        pass

    cal0 = _calibrate(spark)
    results: dict[str, dict] = {}
    for name in only:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"SKIP {name}: not registered", flush=True)
            continue
        row: dict = {}
        try:
            # ---- build phase (driver-side collects inside fn) ----
            sc.setJobDescription(f"{name}: build")
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            row["build_sec"] = round(time.perf_counter() - t0, 3)
            # ---- plan capture ----
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            # ---- noop timing: full build + execute, best-of-N ----
            best_noop, best_count = float("inf"), float("inf")
            for r in range(reps):
                release_persisted()
                release_checkpoints(spark)
                sc.setJobDescription(f"{name}: noop rep{r}")
                t0 = time.perf_counter()
                d = spec.fn(spark, SF_DIR)
                d.write.format("noop").mode("overwrite").save()
                best_noop = min(best_noop, time.perf_counter() - t0)
            for r in range(reps):
                release_persisted()
                release_checkpoints(spark)
                sc.setJobDescription(f"{name}: count rep{r}")
                t0 = time.perf_counter()
                spec.fn(spark, SF_DIR).count()
                best_count = min(best_count, time.perf_counter() - t0)
            row["noop_sec"] = round(best_noop, 3)
            row["count_sec"] = round(best_count, 3)
            ex = plan.count("Exchange")
            row["plan"] = {
                "exchanges": ex,
                "bhj": plan.count("BroadcastHashJoin"),
                "smj": plan.count("SortMergeJoin"),
                "shj": plan.count("ShuffledHashJoin"),
                "batch_eval_python": plan.count("BatchEvalPython"),
                "arrow_eval_python": plan.count("ArrowEvalPython"),
                "map_in_pandas": plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
            }
            print(f"{name}: build={row['build_sec']} noop={row['noop_sec']} "
                  f"count={row['count_sec']} plan={row['plan']}", flush=True)
        except Exception as exc:
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"ERR  {name}: {row['err']}", flush=True)
        finally:
            sc.setJobDescription(None)
            release_persisted()
            release_checkpoints(spark)
        results[name] = row
    cal1 = _calibrate(spark)

    out = {
        "sf_dir": SF_DIR,
        "tag": tag,
        "calibration_sec": [round(cal0, 3), round(cal1, 3)],
        "lanes": results,
    }
    path = os.path.join(PLANS_DIR, f"profile_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path, "cal": out["calibration_sec"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
