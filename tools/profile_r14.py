#!/usr/bin/env python3
"""Round-14 optimization profiler (guide §1): for each requested lane,
build the DataFrame, save ``explain('formatted')`` under plans/r14/,
time the computation against the noop sink (best-of-N in ONE session,
tracked caches released between lanes, calibration bracketed), and —
new vs profile_r13 — count the SPARK JOBS each lane submits (VERDICT
r13 item 1 wants the ppmi job count measurably halved; jobs are
counted by running each rep under its own job group and asking the
status tracker for the group's job ids).

Usage:
    python tools/profile_r14.py --only a,b,c [--tag before] [--reps 3]
    python tools/profile_r14.py --only a,b --plans-only   # no timing
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
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


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
    only, tag, reps, plans_only = None, "before", 3, False
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
    if "--plans-only" in args:
        plans_only = True
        args.remove("--plans-only")
    if not only:
        only = headline_queries()

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark(app_name="profile_r14")
    sc = spark.sparkContext

    if not plans_only:
        try:
            QUERIES[headline_queries()[0]].fn(spark, SF_DIR).count()
        except Exception:
            pass

    cal0 = None if plans_only else _calibrate(spark)
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
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            ex = plan.count("Exchange")
            row["plan"] = {
                "exchanges": ex,
                "bhj": plan.count("BroadcastHashJoin"),
                "smj": plan.count("SortMergeJoin"),
                "shj": plan.count("ShuffledHashJoin"),
                "batch_eval_python": plan.count("BatchEvalPython"),
                "arrow_eval_python": plan.count("ArrowEvalPython"),
                "map_in_pandas": plan.count("MapInPandas")
                + plan.count("FlatMapGroupsInPandas"),
            }
            if not plans_only:
                best_noop = float("inf")
                n_jobs = None
                tracker = sc.statusTracker()
                for r in range(reps):
                    release_persisted()
                    release_checkpoints(spark)
                    group = f"{name}:rep{r}"
                    sc.setJobGroup(group, f"{name}: noop rep{r}")
                    t0 = time.perf_counter()
                    d = spec.fn(spark, SF_DIR)
                    d.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    sc.setJobGroup(None, None)
                    jobs = len(tracker.getJobIdsForGroup(group))
                    n_jobs = jobs if n_jobs is None else min(n_jobs, jobs)
                    best_noop = min(best_noop, dt)
                row["noop_sec"] = round(best_noop, 3)
                row["n_jobs"] = n_jobs
            print(f"{name}: {row}", flush=True)
        except Exception as exc:
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"ERR  {name}: {row['err']}", flush=True)
        finally:
            sc.setJobDescription(None)
            release_persisted()
            release_checkpoints(spark)
        results[name] = row
    cal1 = None if plans_only else _calibrate(spark)

    out = {
        "sf_dir": SF_DIR,
        "tag": tag,
        "calibration_sec": [cal0, cal1],
        "lanes": results,
    }
    path = os.path.join(PLANS_DIR, f"profile_{tag}.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        prev.get("lanes", {}).update(results)
        out["lanes"] = prev["lanes"]
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path, "cal": out["calibration_sec"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
