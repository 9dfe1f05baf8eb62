#!/usr/bin/env python3
"""sf0.1 → sf1.0 soak harness (SCALE.md's measurement method, scripted):
best-of-2 warm timings per query per scale dir in ONE session, printed
as ready-to-paste markdown rows. Ratio ≈1 = fixed-cost dominated;
linear work ≤10 at 10× rows.

Usage: python tools/soak.py q1,q2,...  [sf_small] [sf_big]
Defaults: /root/testdata/sf0.1  .scale/sf1.0
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meerpipe_spark.cacheutil import release_checkpoints, release_persisted
from meerpipe_spark.queries import QUERIES
from meerpipe_spark.session import get_spark


def best_of(spark, name: str, sf_dir: str, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        release_persisted()
        release_checkpoints(spark)
        t0 = time.time()
        QUERIES[name].fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    names = sys.argv[1].split(",")
    small = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    big = sys.argv[3] if len(sys.argv) > 3 else ".scale/sf1.0"
    spark = get_spark(app_name="soak")
    print("| query | sf0.1 s | sf1.0 s | ratio |")
    print("|---|---|---|---|")
    for name in names:
        a = best_of(spark, name, small)
        b = best_of(spark, name, big)
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
