"""Skew-mitigation utilities (SCALE.md 'Skew & hot keys').

AQE's skew-join splitting handles most cases; these helpers cover the
aggregation-side hot keys AQE can't split (a single group receiving a
large fraction of all rows — e.g. one boilerplate document hash, one
hyper-active user): two-phase salted aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg_sum(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase sum: groupBy(key, salt) partial sums, then groupBy(key).

    The salt spreads a hot key over ``salt_buckets`` reducers in phase 1;
    phase 2 combines the (tiny) per-salt partials. For algebraic
    aggregates (sum/count/min/max) the rewrite is exact; means are
    recomposed as sum/count by the caller.
    """
    salt = (F.rand(seed=0) * salt_buckets).cast("int").alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*group_cols, "_salt").agg(
        *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("_s_count"),
    )
    return phase1.groupBy(*group_cols).agg(
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("_s_count").alias("n"),
    )


def top_frequent_keys(df: DataFrame, key: Column, threshold: float = 0.01) -> DataFrame:
    """Hot-key detector: keys holding more than ``threshold`` of all rows
    (drive a broadcast-isolate-then-union plan, or pick salt_buckets)."""
    total = df.count()
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold * total)
    )
