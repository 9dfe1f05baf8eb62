"""Decimation (scrunching) of the 4-D folded-archive cube along any of its
axes — time (tscrunch), frequency (fscrunch), phase bin (bscrunch),
polarisation (pscrunch).

Reference semantics: ``pam --setnsub/--setnchn/-S`` and the config ``flags``
DSL, docs/pipeline_workflow.md:37-45, configuration_files/project_specific/
meertime_jitter.config:19-20, meerpipe/archive_utils.py:105 (bscrunch),
meerpipe/scripts/generate_images_results.py:65 (tscrunch).

Spark-first design (SURVEY.md A1): all four axes collapse into ONE
parameterized weighted hash aggregation —

    groupBy(obs_id, floor(subint/ts_f), pol', floor(chan/fs_f),
            floor(bin/bs_f))
      .agg(sum(value*weight)/sum(weight), sum(weight), avg(freq))

This is a single shuffle on the grouped keys with map-side partial
aggregation; at 100 TB the cube table is partitioned by obs_id so the
shuffle is local to each observation's partitions and AQE coalesces the
post-shuffle partitions. Chained scrunches (``t 320 f 8`` then
``t 64 f 16``) should be issued from the finest common product, not
re-aggregated serially (SURVEY.md §4 fusion note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CUBE_KEYS = ("obs_id", "subint", "pol", "chan", "bin")


def scrunch(
    cube: DataFrame,
    t_factor: int = 1,
    f_factor: int = 1,
    b_factor: int = 1,
    pscrunch: bool = False,
    value_col: str = "value",
    weight_col: str = "weight",
) -> DataFrame:
    """Weighted decimation of the long-form cube (one row per
    (obs_id, subint, pol, chan, bin)).

    Factors are integer group sizes along each axis (e.g. ``t_factor=4``
    merges every 4 consecutive subints). ``pscrunch=True`` SUMS the first
    two polarisations pointwise (I = AA+BB, ``pam -S`` / psrchive
    ``pscrunch`` total-intensity semantics) and drops the rest. psrfits
    weights (DAT_WTS) are per (subint, channel) with no pol axis, so the
    two pol rows of a cell carry the same weight by construction; summing
    the pair under a shared weight is therefore exact with the cell
    weight counted ONCE. Rather than hard-coding a ÷2 (which would double
    already-pscrunched single-pol input), the once-counted weight is the
    sum over pol 0 only — exact for 2-pol coherence input AND a no-op for
    input that is already total-intensity: value = Σ v·w / Σ_{pol=0} w,
    weight = Σ_{pol=0} w — still one hash aggregation, no extra shuffle.
    """
    df = cube
    if pscrunch:
        df = (
            df.filter(F.col("pol") < 2)
            .withColumn("_pol_orig", F.col("pol"))
            .withColumn("pol", F.lit(0))
        )
        # Count each (subint, chan) cell's shared weight once: pol 0 is
        # always present (AA of a coherence pair, or I of total-intensity
        # input), pol 1 contributes value but not weight.
        wsum = F.sum(F.when(F.col("_pol_orig") == 0, F.col(weight_col)).otherwise(F.lit(0.0)))
    else:
        wsum = F.sum(weight_col)
    grouped = (
        df.groupBy(
            "obs_id",
            (F.col("subint") / t_factor).cast("long").alias("subint"),
            "pol",
            (F.col("chan") / f_factor).cast("long").alias("chan"),
            (F.col("bin") / b_factor).cast("long").alias("bin"),
        )
        .agg(
            (
                F.sum(F.col(value_col) * F.col(weight_col))
                / F.when(wsum != 0, wsum)
            ).alias(value_col),
            wsum.alias(weight_col),
            F.avg("freq").alias("freq"),
        )
    )
    return grouped


def template_adjust_factor(template_nbin: int, archive_nbin: int) -> int | None:
    """Integer bin-scrunch factor for matching a template to an archive.

    Reference: meerpipe/archive_utils.py:88-105 — scrunch only when
    ``template_nbin % archive_nbin == 0`` and the factor is > 1; otherwise
    None (caller skips, logged in the reference).
    """
    if archive_nbin <= 0 or template_nbin % archive_nbin != 0:
        return None
    factor = template_nbin // archive_nbin
    return factor if factor > 1 else None


def template_adjust_factor_expr(template_nbin: F.Column, archive_nbin: F.Column) -> F.Column:
    """Column-expression form of :func:`template_adjust_factor` for
    set-wide template↔archive compatibility checks (J8): NULL when the
    template cannot be integer-scrunched onto the archive grid, else the
    bin-scrunch factor (> 1)."""
    factor = (template_nbin / archive_nbin).cast("long")
    ok = (
        (archive_nbin > 0)
        & (template_nbin % archive_nbin == 0)
        & (factor > 1)
    )
    return F.when(ok, factor)


def concat_archives(parts: list[DataFrame], order_col: str = "subint_ts") -> DataFrame:
    """S4 (``psradd``): concatenate per-8s archives of one observation.

    unionByName over the per-file cubes, then the subint ordinal is
    re-derived from the time order (W2): dense_rank over the distinct
    start times within each obs. No data movement beyond one window over
    the (obs, ts) key — the reference shells out to psradd and rewrites
    the whole file.
    """
    from functools import reduce

    from pyspark.sql import Window as W

    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    w = W.partitionBy("obs_id").orderBy(order_col)
    return unioned.withColumn("subint", F.dense_rank().over(w) - 1)
