"""Dense global ID assignment — the post-dedup re-enumeration step of a
training-data pipeline — without the single-reducer global sort.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY plans a
single-partition Exchange in Spark: the entire dataset flows through ONE
task — the textbook 100 TB scale-killer. The classic fix:

1. range-repartition on the order key (balanced range exchange; Spark
   samples boundaries);
2. count rows per physical partition (partial-agg shuffle carrying one
   row per partition) and prefix-sum the counts into offsets on the
   driver — bounded by the partition count, never by data;
3. rank within each partition and add the partition's offset.

When the order key is unique, the result is EXACTLY the global rank —
independent of where the sampled range boundaries land, because
boundaries only split the total order into consecutive runs. That makes
the operator deterministic and oracle-checkable even though the
physical partitioning is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_name: str = "dense_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_name`` = 0-based dense rank of the row in the total
    order of ``order_cols`` (which must be unique keys — equal keys get
    an arbitrary but stable order only within one plan).

    Shuffle inventory: one balanced range exchange + one hash exchange
    on the partition id for the per-partition window (each carries the
    data once, across ALL reducers — never one) + a one-row-per-
    partition count agg. The offsets table is partition-count-sized:
    broadcast, and collected driver-side only to prefix-sum.

    The range-partitioned frame is PERSISTED (tracked) before the count
    job: Spark's range exchange samples its boundaries with an
    execution-dependent seed, so the count job and the enumeration job
    would otherwise see DIFFERENT partitionings and the prefix-sum
    offsets would attach to the wrong rows (reproduced in
    tests/test_ids.py::test_dense_ids_survive_nondeterministic_range_
    boundaries — ~60% of ranks corrupt on a multi-partition input
    without the pin). ``RDD.zipWithIndex`` avoids this only because its
    two jobs share one RDD instance; separate DataFrame actions do not.
    The cache is released by the harnesses' ``release_persisted`` (or
    at interpreter exit); cost is one MEMORY_AND_DISK materialization
    of the input — the unavoidable price of a consistent global
    enumeration.
    """
    from meerpipe_spark.cacheutil import persist_tracked

    cols = [F.col(c) for c in order_cols]
    part = persist_tracked(
        (
            df.repartitionByRange(num_partitions, *cols)
            if num_partitions
            else df.repartitionByRange(*cols)
        ).withColumn("_pid", F.spark_partition_id())
    )

    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    rows = sorted((r._pid, r._n) for r in counts.collect())
    offsets, acc = [], 0
    for pid, n in rows:
        offsets.append((pid, acc))
        acc += n
    off_df = part.sparkSession.createDataFrame(offsets, "_pid int, _off long")

    w = W.partitionBy("_pid").orderBy(*cols)
    return (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn(id_name, F.col("_off") + F.row_number().over(w) - 1)
        .drop("_pid", "_off")
    )


def assign_dense_ranks(
    df: DataFrame,
    key_cols: list[str],
    rank_name: str = "dense_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense rank WITH TIES over the total order of ``key_cols`` (equal
    keys share a rank; ranks are 0-based consecutive) — without a
    single-partition window: the DISTINCT key set (unique by
    construction) goes through :func:`assign_dense_ids`, and the ranks
    join back on the keys. Two extra shuffles (distinct + the rank
    join), both keyed by the key columns — balanced at any scale."""
    keys = df.select(*key_cols).distinct()
    ranked = assign_dense_ids(keys, key_cols, rank_name, num_partitions)
    return df.join(ranked, key_cols)
