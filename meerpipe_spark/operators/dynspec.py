"""Dynamic-spectrum derivation and repair (D4).

Reference: the ``Dynspec`` handling in
meerpipe/scripts/generate_images_results.py:162-191 — ``trim_edges``
(drop fully-zapped leading/trailing channels/subints) and ``refill``
(interpolate zapped cells from neighbors) before plotting/analysis.

Spark-first split:
- deriving the dynspec from the cube is a hash aggregation (template-
  weighted flux per (obs, subint, chan)) — pure relational;
- trim is a relational anti-trim: compute per-channel/subint zap
  fractions, keep the span between the first and last non-zapped index
  (window min/max), no Python;
- refill is genuinely per-grid iterative → grouped-map
  ``applyInPandas`` per obs (each obs's grid is small — nsub × nchan ≤
  a few thousand cells — while the number of obs is huge: the right
  axis to parallelize).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T


def derive_dynspec(
    cube: DataFrame,
    on_pulse: F.Column,
    obs_col: str = "obs_id",
) -> DataFrame:
    """Template-matched flux per (obs, subint, chan): mean on-pulse excess
    over the off-pulse baseline, with the off-pulse rms as the error.
    Zapped cells (weight 0 everywhere) produce flux=0, flux_err=0 — the
    reference's zap marker (archive_utils.py:127)."""
    agg = cube.groupBy(obs_col, "subint", "chan").agg(
        F.avg("freq").alias("freq_mhz"),
        F.sum(F.when(on_pulse, F.col("value") * F.col("weight"))).alias("on_sum"),
        F.sum(F.when(on_pulse, F.col("weight"))).alias("on_w"),
        F.avg(F.when(~on_pulse & (F.col("weight") > 0), F.col("value"))).alias("off_mean"),
        F.stddev_samp(F.when(~on_pulse & (F.col("weight") > 0), F.col("value"))).alias("off_rms"),
    )
    zapped = F.col("on_w").isNull() | (F.col("on_w") == 0)
    return agg.select(
        obs_col,
        "subint",
        "chan",
        "freq_mhz",
        F.when(zapped, 0.0).otherwise(F.col("on_sum") / F.col("on_w") - F.col("off_mean")).alias("flux"),
        F.when(zapped, 0.0).otherwise(F.coalesce(F.col("off_rms"), F.lit(0.0))).alias("flux_err"),
    )


def trim_edges(dynspec: DataFrame, obs_col: str = "obs_id") -> DataFrame:
    """Drop leading/trailing fully-zapped channels and subints per obs —
    window min/max of the non-zapped index, then a filter. No collect."""
    live = F.when((F.col("flux") != 0) | (F.col("flux_err") != 0), F.lit(True))
    w = W.partitionBy(obs_col)
    bounded = (
        dynspec.withColumn("_live_chan", F.when(live, F.col("chan")))
        .withColumn("_live_sub", F.when(live, F.col("subint")))
        .withColumn("chan_lo", F.min("_live_chan").over(w))
        .withColumn("chan_hi", F.max("_live_chan").over(w))
        .withColumn("sub_lo", F.min("_live_sub").over(w))
        .withColumn("sub_hi", F.max("_live_sub").over(w))
    )
    return (
        bounded.filter(
            F.col("chan").between(F.col("chan_lo"), F.col("chan_hi"))
            & F.col("subint").between(F.col("sub_lo"), F.col("sub_hi"))
        )
        .drop("_live_chan", "_live_sub", "chan_lo", "chan_hi", "sub_lo", "sub_hi")
    )


REFILL_SCHEMA = T.StructType(
    [
        T.StructField("obs_id", T.StringType()),
        T.StructField("subint", T.IntegerType()),
        T.StructField("chan", T.IntegerType()),
        T.StructField("freq_mhz", T.DoubleType()),
        T.StructField("flux", T.DoubleType()),
        T.StructField("flux_err", T.DoubleType()),
    ]
)


def refill(dynspec: DataFrame, obs_col: str = "obs_id") -> DataFrame:
    """Interpolate zapped cells from their channel's time-neighbors
    (linear along subint; channel mean fallback; 0 if the whole channel
    is zapped). Grouped-map per obs: the per-group grid is tiny, the obs
    axis carries the parallelism."""

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(["chan", "subint"]).copy()
        zap = (out["flux"] == 0) & (out["flux_err"] == 0)
        for chan, idx in out.groupby("chan").groups.items():
            sel = out.loc[idx]
            z = zap.loc[idx]
            if z.all() or not z.any():
                continue
            good = sel[~z]
            filled = np.interp(
                sel["subint"].to_numpy(dtype=float),
                good["subint"].to_numpy(dtype=float),
                good["flux"].to_numpy(),
            )
            out.loc[idx, "flux"] = np.where(z, filled, sel["flux"])
            out.loc[idx, "flux_err"] = np.where(
                z, float(good["flux_err"].mean()), sel["flux_err"]
            )
        return out

    return dynspec.groupBy(obs_col).applyInPandas(fill, REFILL_SCHEMA)
