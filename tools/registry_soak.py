#!/usr/bin/env python3
"""Full-registry execution soak at a large SF (VERDICT r11 item 6): the
per-round oracle sweeps gate correctness at sf0.01/sf0.1; this runs
EVERY registered lane once at sf1.0 (rows + wall seconds, fail-soft) to
catch any quietly superlinear NON-headline lane that the bounded-join
audit's 4096-row threshold and the headline-only sf1.0 soaks can't see.

Usage: python tools/registry_soak.py [sf_dir] [out.json] [--only a,b]
Defaults: .scale/sf1.0  SWEEP_r12_sf1.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meerpipe_spark.cacheutil import release_checkpoints, release_persisted
from meerpipe_spark.queries import QUERIES
from meerpipe_spark.session import get_spark


def main() -> int:
    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    sf_dir = args[0] if args else ".scale/sf1.0"
    out_path = args[1] if len(args) > 1 else "SWEEP_r12_sf1.json"
    spark = get_spark(app_name="registry_soak")
    lanes: dict[str, dict] = {}
    failed: list[str] = []
    names = [n for n in QUERIES if only is None or n in only]
    for i, name in enumerate(names):
        release_persisted()
        release_checkpoints(spark)
        t0 = time.perf_counter()
        try:
            rows = QUERIES[name].fn(spark, sf_dir).count()
            sec = round(time.perf_counter() - t0, 2)
            lanes[name] = {"rows": rows, "sec": sec}
            print(f"[{i + 1}/{len(names)}] ok   {name}: {rows} rows {sec}s",
                  flush=True)
        except Exception as exc:
            sec = round(time.perf_counter() - t0, 2)
            lanes[name] = {"error": f"{type(exc).__name__}: {exc}"[:300],
                           "sec": sec}
            failed.append(name)
            print(f"[{i + 1}/{len(names)}] FAIL {name}: {exc}", flush=True)
    spark.stop()
    secs = sorted(v["sec"] for v in lanes.values())
    out = {
        "sf_dir": sf_dir,
        "n_lanes": len(names),
        "failed": failed,
        "total_sec": round(sum(secs), 1),
        "max_sec": secs[-1] if secs else None,
        "p50_sec": secs[len(secs) // 2] if secs else None,
        "p90_sec": secs[(len(secs) * 9) // 10] if secs else None,
        "lanes": lanes,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\n{len(names)} lanes, {len(failed)} failed -> {out_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
