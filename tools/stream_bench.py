#!/usr/bin/env python3
"""Sustained-rate micro-bench for the streaming layer (VERDICT r4 #7).

Drives ``streaming.events.dedup_stream`` and
``streaming.sessions.sessionize_stream`` from Spark's ``rate`` source at a
target rows/s for a fixed wall-clock window, then reports what the 100 TB
streaming claims in SCALE.md need numbers for:

- ``sustained_rows_per_sec``  — steady-state processedRowsPerSecond
  (first two warm-up batches dropped);
- ``state_rows_max``          — peak stateOperators numRowsTotal (the
  watermark-bounded-state claim: dedup state must plateau near
  rate x watermark, sessions near the live-user count);
- ``batch_ms_avg``            — mean triggerExecution duration (the
  micro-batch latency floor);
- ``watermark_lag_sec``       — wall-now minus the event-time watermark at
  shutdown (end-to-end lateness bound actually achieved).

Usage: python tools/stream_bench.py [--seconds 60] [--rates 2000,10000,50000]
Prints one JSON line per (scenario, rate).  Run on an idle box; the rate
source is wall-clock driven, so a loaded box under-reports sustainable rate.
"""
from __future__ import annotations

import argparse
import datetime as _dt
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def _session(rocksdb: bool = False, shuffle_partitions: int = 32) -> SparkSession:
    from meerpipe_spark.session import ensure_driver_memory

    ensure_driver_memory()  # builder-config driver.memory is a no-op in local mode
    b = (
        SparkSession.builder.master("local[32]")
        .appName("stream-bench")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "false")  # streaming: fixed plan
        .config("spark.ui.enabled", "false")
    )
    if rocksdb:
        # the 100 TB state backend: the default HDFS-backed store keeps
        # every state row ON-HEAP (200k rows/s x 30 s watermark ~ 6M rows
        # OOMs a default heap); RocksDB keeps state off-heap/on-disk with
        # changelog checkpointing, which is how production clusters hold
        # tens of millions of keys per executor
        b = b.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    return b.getOrCreate()


def _rate_events(spark: SparkSession, rows_per_sec: int, n_users: int):
    """rate source -> event-shaped stream.  Every value appears under two
    consecutive ids' keys?  No — dedup needs real duplicates: key =
    floor(value/2) makes each dedup key arrive exactly twice (adjacent
    rows), the re-delivery pattern dedup_stream exists to suppress."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") / 2).cast("long").alias("event_id"),
            F.pmod(F.xxhash64("value"), F.lit(n_users)).alias("user_id"),
            (F.pmod(F.col("value"), F.lit(100)) / F.lit(10.0)).alias("value"),
        )
    )


def _drain(query, seconds: float, wm_delay_sec: float = 0.0) -> dict:
    time.sleep(seconds)
    progresses = [
        p if isinstance(p, dict) else json.loads(p if isinstance(p, str) else p.json)
        for p in query.recentProgress
    ]
    query.stop()
    query.awaitTermination(30)
    # steady state: drop the first two (JIT/codegen warm-up) batches
    steady = [p for p in progresses[2:] if p.get("numInputRows", 0) > 0]
    if not steady:
        steady = progresses or [{}]
    rates = [p.get("processedRowsPerSecond", 0.0) for p in steady]
    batch_ms = [
        p.get("durationMs", {}).get("triggerExecution", 0) for p in steady
    ]
    state_rows = [
        sum(op.get("numRowsTotal", 0) for op in p.get("stateOperators", []))
        for p in progresses
    ]
    wm_lag = None
    for p in reversed(progresses):
        wm = p.get("eventTime", {}).get("watermark")
        if wm:
            wall = _dt.datetime.now(_dt.timezone.utc)
            wm_ts = _dt.datetime.fromisoformat(wm.replace("Z", "+00:00"))
            wm_lag = round((wall - wm_ts).total_seconds(), 1)
            break
    return {
        "batches": len(steady),
        "sustained_rows_per_sec": round(statistics.mean(rates), 1) if rates else 0.0,
        "batch_ms_avg": round(statistics.mean(batch_ms), 1) if batch_ms else 0.0,
        "state_rows_max": max(state_rows) if state_rows else 0,
        # wall-now minus watermark includes the CONFIGURED delay by
        # construction; subtracting it leaves the processing lag the
        # engine actually adds on top of the lateness contract.
        "processing_lag_sec": round(wm_lag - wm_delay_sec, 1) if wm_lag is not None else None,
    }


def bench_dedup(spark, rows_per_sec: int, seconds: float, watermark: str = "30 seconds") -> dict:
    from meerpipe_spark.streaming.events import dedup_stream

    ev = _rate_events(spark, rows_per_sec, n_users=10_000)
    out = dedup_stream(ev, ["event_id"], watermark=watermark)
    ck = tempfile.mkdtemp(prefix="sb-dedup-")
    try:
        q = (
            out.writeStream.format("noop")
            .option("checkpointLocation", ck)
            .start()
        )
        res = _drain(q, seconds, wm_delay_sec=30.0)
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    res.update(scenario="dedup_stream", rate_target=rows_per_sec, watermark=watermark)
    return res


def bench_sessions(spark, rows_per_sec: int, seconds: float, gap_s: float = 20.0) -> dict:
    from meerpipe_spark.streaming.sessions import sessionize_stream

    # fewer users than dedup so per-user cadence ~ rate/users; gap 20 s with
    # 2 h watermark: sessions stay OPEN during the run -> state ~= live users.
    ev = _rate_events(spark, rows_per_sec, n_users=2_000)
    out = sessionize_stream(ev, gap_minutes=gap_s / 60.0, watermark="2 hours")
    ck = tempfile.mkdtemp(prefix="sb-sess-")
    try:
        q = (
            out.writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ck)
            .start()
        )
        res = _drain(q, seconds, wm_delay_sec=7200.0)
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    res.update(scenario="sessionize_stream", rate_target=rows_per_sec, gap_s=gap_s)
    return res


def bench_join(
    spark, rows_per_sec: int, seconds: float, n_users: int = 5_000,
    bucket: str | None = None,
) -> dict:
    """Watermarked stream-stream interval join at rate: the left stream
    re-keys every other row so ~half the right rows find a same-user
    match inside the 60 s gap. State = both sides' unexpired rows —
    the operator whose unbounded form melts; the watermark bound is
    what this point demonstrates. ``bucket`` switches to the composite
    (user, time-bucket) key variant (join_event_streams_bucketed — the
    r11 knee-analysis mitigation for low key cardinality)."""
    from meerpipe_spark.streaming.events import (
        join_event_streams,
        join_event_streams_bucketed,
    )

    left = _rate_events(spark, rows_per_sec // 2, n_users=n_users)
    right = _rate_events(spark, rows_per_sec // 2, n_users=n_users)
    if bucket is None:
        out = join_event_streams(
            left, right, max_gap="60 seconds", watermark="2 minutes"
        )
    else:
        out = join_event_streams_bucketed(
            left, right, max_gap="60 seconds", watermark="2 minutes",
            bucket=bucket,
        )
    ck = tempfile.mkdtemp(prefix="sb-join-")
    try:
        q = (
            out.writeStream.format("noop")
            .option("checkpointLocation", ck)
            .start()
        )
        res = _drain(q, seconds, wm_delay_sec=120.0)
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    res.update(
        scenario="join_streams_bucketed" if bucket else "join_streams",
        rate_target=rows_per_sec, max_gap="60 seconds", n_users=n_users,
    )
    if bucket:
        res.update(bucket=bucket)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--rates", default="2000,10000,50000")
    ap.add_argument("--scenarios", default="dedup,sessions")
    ap.add_argument("--rocksdb", action="store_true",
                    help="RocksDB state store (off-heap state; required "
                         "for the 200k+ rows/s points)")
    ap.add_argument("--n-users", type=int, default=5_000,
                    help="join-key cardinality for the join scenarios")
    ap.add_argument("--bucket", default="30 seconds",
                    help="time-bucket width for join_bucketed")
    ap.add_argument("--shuffle-partitions", type=int, default=32,
                    help="state-store partition count (fixed for the "
                         "life of a checkpoint; the per-batch state "
                         "maintenance overhead knob)")
    args = ap.parse_args()
    rates = [int(r) for r in args.rates.split(",")]
    spark = _session(rocksdb=args.rocksdb, shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for rate in rates:
        if "dedup" in args.scenarios:
            results.append(bench_dedup(spark, rate, args.seconds))
            print(json.dumps(results[-1]), flush=True)
        if "join_bucketed" in args.scenarios:
            print(json.dumps(bench_join(
                spark, rate, args.seconds, n_users=args.n_users,
                bucket=args.bucket,
            )), flush=True)
        elif "join" in args.scenarios:
            print(json.dumps(bench_join(
                spark, rate, args.seconds, n_users=args.n_users,
            )), flush=True)
        if "sessions" in args.scenarios:
            results.append(bench_sessions(spark, rate, args.seconds))
            print(json.dumps(results[-1]), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
