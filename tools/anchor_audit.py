#!/usr/bin/env python3
"""Fresh-session anchor audit (VERDICT r12 item 1 — kill the recurring
bench-false-flag class, not just each round's instances).

Mechanism of the false flags (r10 delay_rules, r11 asof/bucketed/binned,
r12 skew_profile/funnels/seasonal/last_touch — every one later proven
code-flat by frozen-checkout interleaved A/B): bench anchors were pinned
from a fully-warmed 102-query session, but a FRESH session (the driver's
per-round bench is one) reads sub-second lanes 1.3-2.5x higher before
JIT/footer-cache warmup, so any load spike clears the 2x gate and the
0.5 s absolute-slack floor. The fix is structural: every anchor must
satisfy 2*anchor >= 3*fresh_idle_min (the r12 re-pin criterion), i.e.
anchor >= 1.5 * fresh-session idle best-of-N minimum.

This tool measures those minima: ONE fresh process per invocation, NO
warmup query, each requested lane timed best-of-N with tracked caches
released between lanes, calibration bracketed before/after so a loaded
session is recognizable (cal >> CALIBRATION_ANCHOR_SEC). Run it 2-3
times across the day and take the per-lane MIN of the session minima as
the idle estimate; re-pin any anchor below 1.5x that value.

Usage: python tools/anchor_audit.py [out.json] [--max-anchor 0.5]
                                    [--only a,b] [--reps 5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from meerpipe_spark.cacheutil import release_checkpoints, release_persisted
from meerpipe_spark.queries import QUERIES
from meerpipe_spark.session import get_spark


def main() -> int:
    args = list(sys.argv[1:])
    only, max_anchor, reps = None, 0.5, 5
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    if "--max-anchor" in args:
        i = args.index("--max-anchor")
        max_anchor = float(args[i + 1])
        del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    out_path = args[0] if args else "ANCHOR_AUDIT.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    lanes = [
        n for n, a in bench.ANCHORS.items()
        if (only is None and a < max_anchor) or (only is not None and n in only)
    ]
    spark = get_spark(app_name="anchor_audit")
    cal0 = bench._calibrate(spark)
    t_min: dict[str, float] = {}
    for i, name in enumerate(lanes):
        best = float("inf")
        for _ in range(reps):
            release_persisted()
            release_checkpoints(spark)
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        t_min[name] = round(best, 3)
        print(f"[{i + 1}/{len(lanes)}] {name}: min {best:.3f}s "
              f"(anchor {bench.ANCHORS[name]})", flush=True)
    cal1 = bench._calibrate(spark)
    spark.stop()
    row = {
        "sf_dir": sf_dir,
        "reps": reps,
        "cal_before": round(cal0, 4),
        "cal_after": round(cal1, 4),
        "cal_anchor": bench.CALIBRATION_ANCHOR_SEC,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "minima": t_min,
        "anchors": {n: bench.ANCHORS[n] for n in t_min},
        "needs_repin": sorted(
            n for n, m in t_min.items() if bench.ANCHORS[n] < 1.5 * m
        ),
    }
    with open(out_path, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps({k: row[k] for k in
                      ("cal_before", "cal_after", "loadavg_1m", "needs_repin")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
