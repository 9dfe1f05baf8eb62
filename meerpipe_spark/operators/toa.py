"""TOA (time-of-arrival) layer: selection logic, decimation sizing,
residual statistics.

Reference: tempo2 ``-select`` logic (default_toa_logic.select:1 —
``LOGIC -snr < 10 REJECT``; tempo2_wrapper.sh:19-27,36), and
meerpipe/calc_max_nsub.py:4-52 (docs/logic.md:7-40) — the cost-based
choice of time decimation that maximizes TOA count subject to a desired
per-TOA S/N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def toa_select(
    toas: DataFrame,
    snr_min: float = 10.0,
    mjd_start: float = 40000.0,
    mjd_finish: float = 99999.0,
    max_obs: int = 1_000_000,
    snr_col: str = "snr",
    mjd_col: str = "bat_mjd",
) -> DataFrame:
    """F6 TOA quality selection: reject snr < threshold, clamp to the MJD
    window, cap the row count (tempo2 ``-nobs``/``-set START/FINISH``,
    tempo2_wrapper.sh:36)."""
    return (
        toas.filter(F.col(snr_col) >= snr_min)
        .filter(F.col(mjd_col).between(mjd_start, mjd_finish))
        .limit(max_obs)
    )


def calc_max_nsub(
    sn: Column,
    nchan: Column,
    duration_s: Column,
    input_nsub: Column,
    sn_desired: float = 12.0,
    minimum_duration_s: float = 480.0,
) -> Column:
    """A14, exact reference semantics (meerpipe/calc_max_nsub.py:4-52):

        sn_chan = sn / sqrt(nchan)
        est_dur = max(minimum_duration, duration * (sn_desired/sn_chan)^2)
        nsub    = min(input_nsub, floor(duration / est_dur))

    No lower clamp — nsub may legitimately be 0 (archive too faint).
    Pure least/greatest/floor/sqrt expression; parameterizes the A1
    time-scrunch like a cost-based optimizer choosing grouping granularity.
    """
    sn_chan = sn / F.sqrt(nchan.cast("double"))
    ratio = F.lit(float(sn_desired)) / sn_chan
    est = F.greatest(F.lit(float(minimum_duration_s)), duration_s * ratio * ratio)
    return F.least(input_nsub.cast("long"), F.floor(duration_s / est))


def residual_stats(
    toas: DataFrame,
    group_cols: tuple[str, ...] = ("psr",),
    residual_col: str = "residual_s",
    err_col: str = "err_ns",
) -> DataFrame:
    """Per-pulsar residual summary: wrms, chi2-style normalized scatter.

    wrms = sqrt( sum(r²/e²) / sum(1/e²) ) with errors in seconds.
    """
    err_s = F.col(err_col) * 1e-9
    w = 1.0 / (err_s * err_s)
    r = F.col(residual_col)
    return toas.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_toa"),
        F.sqrt(F.sum(w * r * r) / F.sum(w)).alias("wrms_s"),
        F.avg(r).alias("mean_residual_s"),
        F.stddev_samp(r).alias("std_residual_s"),
    )
