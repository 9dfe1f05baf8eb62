#!/usr/bin/env python3
"""Interleaved frozen-checkout A/B bench (the AB_r8_vs_r9 method,
scripted): given two git worktree paths and a lane list, run A-B-A-B-…
process pairs; each process opens ONE warm session against its
checkout, runs every lane best-of-N, runs the calibration workload
before and after, and appends one JSONL row. Ratios of per-repo minima
across the interleaved rows separate code regressions from box noise
(a real regression shows in EVERY pair; noise doesn't).

Usage:
    python tools/ab_bench.py REPO_A REPO_B lane1,lane2 [pairs] [out.jsonl]

The worktrees must be full checkouts (git worktree add /tmp/ab_rX REF).
This file only orchestrates subprocesses; the child payload imports the
CHECKOUT's meerpipe_spark, so the tool runs identically from any HEAD.
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
repo, lanes_csv, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, repo)
from meerpipe_spark.cacheutil import release_checkpoints, release_persisted
from meerpipe_spark.queries import QUERIES
from meerpipe_spark.session import get_spark
import bench  # the checkout's calibration workload

spark = get_spark(app_name="ab")
import os
sf = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
out = {"repo": repo, "cal": [], "t": {}}
out["cal"].append(round(bench._calibrate(spark), 4))
for name in lanes_csv.split(","):
    best = float("inf")
    for _ in range(reps):
        release_persisted(); release_checkpoints(spark)
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf).count()
        best = min(best, time.perf_counter() - t0)
    out["t"][name] = round(best, 3)
out["cal"].append(round(bench._calibrate(spark), 4))
spark.stop()
print("ABROW " + json.dumps(out))
"""


def run_child(repo: str, lanes: str, reps: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, repo, lanes, str(reps)],
        capture_output=True, text=True, cwd=repo, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABROW "):
            return json.loads(line[6:])
    raise RuntimeError(f"child failed in {repo}:\n{p.stderr[-2000:]}")


def main() -> None:
    repo_a, repo_b, lanes = sys.argv[1], sys.argv[2], sys.argv[3]
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    out_path = sys.argv[5] if len(sys.argv) > 5 else "AB.jsonl"
    import os
    reps = int(os.environ.get("AB_REPS", "5"))
    rows = []
    with open(out_path, "a") as fh:
        for _ in range(pairs):
            for repo in (repo_a, repo_b):
                row = run_child(repo, lanes, reps)
                rows.append(row)
                fh.write(json.dumps(row) + "\n")
                fh.flush()
                print(json.dumps(row), flush=True)
    for name in lanes.split(","):
        a = min(r["t"][name] for r in rows if r["repo"] == repo_a)
        b = min(r["t"][name] for r in rows if r["repo"] == repo_b)
        print(f"| {name} | {a:.3f} | {b:.3f} | {b / a:.2f} |")


if __name__ == "__main__":
    main()
