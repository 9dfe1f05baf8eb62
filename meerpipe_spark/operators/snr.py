"""Signal-to-noise operators: per-profile S/N and cumulative S/N series.

Reference: ``psrstat -j FTp -c snr=pdmp`` (docs/logic.md:11-15,
meerpipe/scripts/generate_images_results.py:69-81) for the scalar S/N of a
fully scrunched profile; generate_images_results.py:52-93 for the
per-subint and cumulative S/N time series — which the reference computes
with an O(n²) clone-zap-rescrunch loop and this engine computes with one
window aggregation (SURVEY.md A7/A8/W1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def profile_snr(
    profile: DataFrame,
    group_cols: list[str],
    on_pulse: F.Column,
    value_col: str = "value",
) -> DataFrame:
    """S/N of a folded profile per group:

        snr = sum(on-pulse excess) / (off-pulse rms * sqrt(n_on))

    where the baseline is the off-pulse mean. One hash aggregation; the
    on/off window predicate is a column expression (template-derived
    upstream).
    """
    off_val = F.when(~on_pulse, F.col(value_col))
    on_val = F.when(on_pulse, F.col(value_col))
    return profile.groupBy(*group_cols).agg(
        (
            (F.sum(on_val) - F.count(on_val) * F.avg(off_val))
            / (F.stddev_samp(off_val) * F.sqrt(F.count(on_val)))
        ).alias("snr")
    )


def cumulative_snr(
    per_subint: DataFrame,
    obs_col: str = "obs_id",
    subint_col: str = "subint",
    sum_col: str = "on_sum",
    rms_col: str = "off_rms",
) -> DataFrame:
    """Cumulative S/N after k subints, for every k, in one pass.

    Input: one row per (obs, subint) with the subint's on-pulse sum and
    off-pulse rms. Running S/N ∝ cum_sum(on) / sqrt(cum_sum(rms²)) over a
    rowsBetween(unboundedPreceding, current) frame — O(n) vs the
    reference's O(n²) zap-loop (generate_images_results.py:54-91).
    """
    w = (
        W.partitionBy(obs_col)
        .orderBy(subint_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return per_subint.select(
        obs_col,
        subint_col,
        F.col(sum_col).alias("single_sum"),
        (F.sum(sum_col).over(w) / F.sqrt(F.sum(F.col(rms_col) ** 2).over(w))).alias("cumulative_snr"),
    )


def normalize_profile(value_col: F.Column, w: "W" = None, group_cols: tuple[str, ...] = ("obs_id",)) -> F.Column:
    """A9 profile normalization (make_stokes_movie.py:28-30):
    (p − min) / (max − min) per group, as window expressions (a constant
    profile normalizes to 0)."""
    win = W.partitionBy(*group_cols)
    lo = F.min(value_col).over(win)
    hi = F.max(value_col).over(win)
    return F.when(hi != lo, (value_col - lo) / (hi - lo)).otherwise(F.lit(0.0))


def pdmp_snr(
    profile: DataFrame,
    nbin: int,
    group_cols: tuple[str, ...] = ("obs_id",),
    value_col: str = "value",
    widths: tuple[int, ...] | None = None,
) -> DataFrame:
    """A7 pdmp-style S/N with on-pulse WINDOW SEARCH: try every circular
    candidate window (start ∈ [0, nbin), width ∈ widths) and keep the
    best S/N — the reference's ``snr=pdmp`` (docs/logic.md:11-15) without
    fixing the window a priori.

    Relational form, scale-shaped: the raw rows FIRST collapse to per-bin
    sufficient statistics (≤ nbin rows per group — data volume gone), and
    only those tiny partials are theta-joined to the broadcast candidate
    dim (start, width) on circular membership. The candidate sweep then
    costs O(groups · nbin · |candidates|) regardless of input row count;
    off-pulse stats come from the group totals by complement.
    """
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    widths = widths or (max(1, nbin // 8), max(1, nbin // 4), max(1, nbin // 2))
    cands = spark.createDataFrame(
        [(s, w) for s in range(nbin) for w in widths], ["win_start", "win_width"]
    )
    per_bin = profile.groupBy(*group_cols, "bin").agg(
        F.sum(value_col).alias("b_sum"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("b_sq"),
        F.count(F.lit(1)).alias("b_n"),
    )
    # Group totals as full-frame window aggregates over the (tiny) per-bin
    # partials: the whole operator is then ONE pass over the input — no
    # .cache() (which pinned executor memory across pipeline-loop calls),
    # no second scan, no totals broadcast.
    wt = W.partitionBy(*group_cols)
    per_bin = (
        per_bin.withColumn("tot_sum", F.sum("b_sum").over(wt))
        .withColumn("tot_sq", F.sum("b_sq").over(wt))
        .withColumn("tot_n", F.sum("b_n").over(wt))
    )
    in_window = (
        ((F.col("bin") - F.col("win_start") + nbin) % nbin) < F.col("win_width")
    )
    scored = (
        per_bin.join(F.broadcast(cands), in_window)
        .groupBy(*group_cols, "win_start", "win_width")
        .agg(
            F.sum("b_sum").alias("on_sum"),
            F.sum("b_sq").alias("on_sq"),
            F.sum("b_n").alias("on_n"),
            F.first("tot_sum").alias("tot_sum"),
            F.first("tot_sq").alias("tot_sq"),
            F.first("tot_n").alias("tot_n"),
        )
        .withColumn("off_n", F.col("tot_n") - F.col("on_n"))
        .withColumn("off_sum", F.col("tot_sum") - F.col("on_sum"))
        .withColumn("off_mean", F.col("off_sum") / F.col("off_n"))
        .withColumn(
            "off_std",
            F.sqrt(
                (F.col("tot_sq") - F.col("on_sq")) / F.col("off_n")
                - F.col("off_mean") * F.col("off_mean")
            ),
        )
        .withColumn(
            "snr",
            (F.col("on_sum") - F.col("on_n") * F.col("off_mean"))
            / (F.col("off_std") * F.sqrt(F.col("on_n"))),
        )
    )
    # Deterministic selection: rank on snr rounded past float-noise, then
    # (win_start, win_width) — sparse profiles make exact ties between
    # windows covering the same rows common, and max_by would pick
    # arbitrarily.
    sel = W.partitionBy(*group_cols).orderBy(
        F.desc(F.round("snr", 6)), F.col("win_start"), F.col("win_width")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(sel))
        .filter(F.col("_rn") == 1)
        .select(*group_cols, "win_start", "win_width", "snr")
    )
