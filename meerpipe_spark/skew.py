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


def skew_profile(df: DataFrame, key: Column, top: int = 10) -> DataFrame:
    """Key-distribution skew diagnostic: the report that tells you
    whether a groupBy/join on `key` needs salting BEFORE you burn a
    cluster-day discovering it.

    Returns the `top` heaviest keys as (rank, key, cnt, share, cum_share)
    plus the exact Gini coefficient of the full key-count distribution
    in every row (same value repeated — keeps the result one flat,
    hash-checkable table).

    Shapes: one groupBy (map-side partials absorb the very skew being
    measured), one bigint-exact window pass over the VOCAB-sized count
    table for the Gini sums (never over raw rows), and a TakeOrdered
    top-k. Gini = (2·Σ rank·cnt) / (n·Σ cnt) − (n+1)/n over counts
    ascending — all terms exact bigints until two final divisions,
    rounded at 6dp.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(key.alias("key")).agg(F.count("*").cast("bigint").alias("cnt"))
    asc = W.orderBy(F.col("cnt").asc(), F.col("key").asc())
    stats = counts.select(
        "key",
        "cnt",
        F.row_number().over(asc).alias("_r"),
    ).agg(
        F.sum(F.col("_r") * F.col("cnt")).alias("_rc"),
        F.sum("cnt").alias("_tot"),
        F.count("*").alias("_n"),
    )
    desc = W.orderBy(F.col("cnt").desc(), F.col("key").asc())
    ranked = counts.select(
        F.row_number().over(desc).alias("rank"), "key", "cnt"
    ).filter(F.col("rank") <= top)
    cum = W.orderBy("rank").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ranked.crossJoin(F.broadcast(stats))
        .select(
            "rank",
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("_tot"), 6).alias("share"),
            F.round(F.sum("cnt").over(cum) / F.col("_tot"), 6).alias("cum_share"),
            F.round(
                2 * F.col("_rc") / (F.col("_n") * F.col("_tot"))
                - (F.col("_n") + 1) / F.col("_n"),
                6,
            ).alias("gini"),
        )
    )
