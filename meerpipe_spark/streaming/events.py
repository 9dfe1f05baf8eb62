"""Structured-Streaming layer: observation-event ingestion, incremental
"unprocessed-only" semantics, idempotent sinks, job-state rollups.

Reference semantics (SURVEY.md §2.11, D10): each new observation triggers
one pipeline run (README.md:19); ``-unprocessed`` selects only
observations not yet handled by a given pipeline (README.md:107); results
are upserted in real time (README.md:46); processings have a 6-state
lifecycle rolled up for monitoring (docs/running_pipeline.md:78-88).

Spark mapping:
- arrival stream = file/Delta ``readStream`` over the events/observations
  directory (at scale: Kafka or Delta CDF — the transformations are
  identical);
- unprocessed filter = LEFT ANTI join against the processed-keys sink
  inside ``foreachBatch`` (exactly-once via checkpoint + idempotent
  append keyed on obs_id);
- windowed aggregations = watermarked tumbling windows for late data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source observation/event stream. maxFilesPerTrigger bounds
    per-batch work (the reference's ``-job_limit`` throttle)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .format(fmt)
        .load(path)
    )


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation per event type — the
    streaming form of the batch ``events_tumbling_window`` query (the
    8-second subint cadence maps to window(ts, '8 seconds') on ingest)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    watermark_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact-dedup: the first arrival of each key wins —
    the streaming twin of ``operators.dedup.exact_dedup`` (key on
    ``md5(text)`` for content dedup, on the event id for re-delivery
    suppression).

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    EVICTS entries once the watermark passes them, so state is
    O(arrival rate × watermark delay), not O(corpus) — the property
    that makes streaming dedup viable at 100 TB/day. The trade is the
    guarantee window: a duplicate arriving later than the watermark
    delay after its first copy is NOT suppressed (pair with a
    downstream batch `exact_dedup` compaction for full-history
    guarantees)."""
    return stream.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def unprocessed(batch: DataFrame, processed_keys: DataFrame, key: str = "event_id") -> DataFrame:
    """F9: LEFT ANTI join batch × already-processed keys."""
    return batch.join(processed_keys, key, "left_anti")


def run_incremental_pipeline(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    transform,
) -> None:
    """Drive the per-observation pipeline incrementally with exactly-once
    semantics: each micro-batch anti-joins the processed-keys ledger
    (idempotent re-delivery), applies ``transform``, appends results and
    extends the ledger. ``availableNow`` processes the backlog and stops
    (the batch-launcher mode); remove it for continuous operation.
    """
    results_dir = os.path.join(sink_dir, "results")
    ledger_dir = os.path.join(sink_dir, "ledger")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        try:
            ledger = s.read.parquet(ledger_dir)
        except Exception:
            ledger = s.createDataFrame([], "event_id long")
        todo = unprocessed(batch, ledger).cache()
        transform(todo).write.mode("append").parquet(results_dir)
        todo.select("event_id").write.mode("append").parquet(ledger_dir)
        todo.unpersist()

    stream = read_event_stream(spark, source_dir)
    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def job_state_rollup(processings: DataFrame, state_col: str = "state") -> DataFrame:
    """A15: count per lifecycle state (Configuring/Pending/Running/
    Complete/Failure/Crashed)."""
    return processings.groupBy(state_col).agg(F.count(F.lit(1)).alias("n"))


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: each right-stream event
    pairs with the same user's left-stream events from the preceding
    ``max_gap`` (attribution: purchase ← clicks within the hour).

    The event-time range condition plus both-side watermarks bound the
    join state — Spark evicts left rows older than (right watermark −
    max_gap), so state is O(arrival rate × gap), not unbounded. At
    100 TB/day this is the only viable stream-correlation shape; an
    unconstrained stream join would accumulate forever.
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.user_id = r.user_id AND r.ts >= l.ts AND r.ts <= l.ts + interval {max_gap}"
        ),
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def _interval_seconds(interval: str) -> int:
    """Seconds in a simple 'N seconds|minutes|hours' interval string."""
    n, unit = interval.split()
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }
    if unit not in mult:
        raise ValueError(f"unsupported interval unit in {interval!r}")
    return int(n) * mult[unit]


def join_event_streams_bucketed(
    left: DataFrame,
    right: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
    bucket: str = "30 minutes",
) -> DataFrame:
    """``join_event_streams`` with the key-compositing mitigation the
    r11 knee analysis prescribes (SCALE.md: per-key probe fan-in is the
    stream-join knee; per-row state work ∝ (rate ÷ keys) × retention).

    The join key becomes (user_id, floor(event_sec / bucket)): the
    right side is exploded into the ``gap // bucket + 2`` candidate
    buckets its match window [r.ts − max_gap, r.ts] can span, so every
    (left, right) pair still meets in EXACTLY ONE copy (a left row's
    bucket is unique — no dedup needed) and results are identical to
    the plain interval join. What changes is the state scanned per
    probe: the symmetric hash join scans only same-COMPOSITE-key rows,
    so probe fan-in is capped at ~rate/keys × (gap + 2·bucket) of
    rows — independent of the watermark AND of batch lag. That
    independence is the point: in the plain join, slow batches delay
    eviction, which grows per-probe scans, which slows batches further
    (the r11-measured degradation spiral at 5k users); the composite
    key breaks the feedback loop. Cost: right-side ingestion and state
    inserts multiply by gap//bucket + 2 — pick ``bucket`` ≈ gap/2 … gap
    so the explode factor stays 3–4 while the probed span stays
    O(gap).
    """
    gap_s = _interval_seconds(max_gap)
    w_s = _interval_seconds(bucket)
    # gap//W (+1 for the non-divisible remainder bucket, +1 guard for
    # unix_timestamp's whole-second truncation of sub-second ts)
    n_copies = gap_s // w_s + 2
    l = (
        left.withWatermark("ts", watermark)
        .withColumn("_jb", F.floor(F.unix_timestamp("ts") / F.lit(w_s)))
        .alias("l")
    )
    r = (
        right.withWatermark("ts", watermark)
        .withColumn(
            "_k", F.explode(F.array(*[F.lit(k) for k in range(n_copies)]))
        )
        .withColumn(
            "_jb", F.floor(F.unix_timestamp("ts") / F.lit(w_s)) - F.col("_k")
        )
        .alias("r")
    )
    return l.join(
        r,
        F.expr(
            "l.user_id = r.user_id AND l._jb = r._jb AND "
            f"r.ts >= l.ts AND r.ts <= l.ts + interval {max_gap}"
        ),
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def trending_sketch_stream(
    stream: DataFrame,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Per-window Count-Min registers over a streaming key — heavy-
    hitter ("trending") detection with BOUNDED state: the per-window
    state is depth×width counters regardless of key cardinality, where
    a per-key windowed count would hold one state row per (window, key)
    and melt on a hot shard. Downstream, any candidate key's windowed
    frequency is a broadcast probe of the emitted registers
    (sketches.cms_probe), and windows merge cell-wise into coarser
    trend lines — the same mergeable algebra as the batch sketch, so
    the streaming registers are VERIFIABLE against a batch rebuild
    (tests/test_streaming.py::test_trending_sketch_matches_batch).

    Watermarked tumbling windows in append mode; a finalized window's
    registers are immutable once emitted.
    """
    from meerpipe_spark.operators.sketches import _cms_bucket

    buckets = F.array(
        *[_cms_bucket(F.col(value_col).cast("string"), j, width) for j in range(depth)]
    )
    return (
        stream.withWatermark("ts", watermark)
        .select(F.col("ts"), F.posexplode(buckets).alias("j", "bucket"))
        .groupBy(F.window("ts", window).alias("win"), "j", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            "j",
            "bucket",
            "cnt",
        )
    )


def windowed_hll_stream(
    stream: DataFrame,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window HyperLogLog registers over a streaming key — windowed
    DISTINCT counting with BOUNDED state, the companion sketch to
    trending_sketch_stream (Count-Min = frequencies, HLL = distincts):
    per-window state is ≤1024 register rows regardless of key
    cardinality, where a windowed count_distinct would hold one state
    row per (window, key). Registers use the deterministic md5 layout
    of sketches.hll_distinct (register = 12-bit md5 prefix, payload =
    leading-zero rank via base-2 string length), aggregated by max —
    commutative/associative, so micro-batch order can't change a
    finalized window's registers, and the streaming output is
    VERIFIABLE against a batch rebuild register by register
    (tests/test_streaming.py). Estimate downstream with the same
    harmonic-mean arithmetic, or merge windows by max into coarser
    grains first.
    """
    m = 1 << 10
    h = F.md5(F.col(value_col).cast("string"))
    j = F.conv(F.substring(h, 1, 3), 16, 10).cast("int") % m
    w = F.conv(F.substring(h, 4, 12), 16, 10).cast("bigint")
    bitlen = F.when(w == 0, F.lit(0)).otherwise(
        F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        stream.withWatermark("ts", watermark)
        .select(F.col("ts"), j.alias("j"), (F.lit(49) - bitlen).alias("rank"))
        .groupBy(F.window("ts", window).alias("win"), "j")
        .agg(F.max("rank").alias("M"))
        .select(F.col("win.start").alias("window_start"), "j", "M")
    )
