"""Flux calibration via the radiometer equation.

Reference: meerpipe/scripts/fluxcal_meerkat.py:356-450 (SURVEY.md §3.2) —
the end-to-end flux-calibration query:

1. per-channel off-pulse RMS (``psrstat off:rms``, :293-308)    → A5
2. median RMS over an in-band channel window (:311-342)         → F4+A6
3. expected RMS from the radiometer equation (:257-291)         → A10
4. multiplier = expected/observed, applied to every value
   (``pam --mult``, :344-351,439-446)                           → A11

Spark-first: one DataFrame DAG — groupBy(chan) agg → filter → exact
median (NOT percentile_approx; oracle-exactness per SURVEY.md §7.3.5) →
scalar broadcast join back → withColumn multiply. Single shuffle on
(obs, chan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Constants from fluxcal_meerkat.py:148,157,225-226,234,262-268
GAIN_K_PER_JY = 19.0        # antenna gain proxy used in mK→Jy conversion
LBAND_SEFD_JY = 390.0       # @1390 MHz
UHF_TSYS_K = 18.5           # @800 MHz
LBAND_TSKY_DEFAULT_MK = 3400.0
UHF_TSKY_DEFAULT_K = 5.5
SCALING = 1.7202


def offpulse_rms_per_channel(
    cube: DataFrame,
    off_pulse: F.Column,
    group_cols: tuple[str, ...] = ("obs_id", "chan"),
    value_col: str = "value",
) -> DataFrame:
    """A5: stddev of off-pulse bins per channel + channel centre freq."""
    return cube.groupBy(*group_cols).agg(
        F.stddev_samp(F.when(off_pulse, F.col(value_col))).alias("off_rms"),
        F.avg("freq").alias("freq"),
    )


def expected_rms(
    ssys_jy: F.Column,
    bw_mhz: F.Column,
    nchan: F.Column,
    tobs_s: F.Column,
    nbin: F.Column,
) -> F.Column:
    """A10: radiometer-equation expected RMS

        ssys / sqrt(2 * (bw/nchan) * (tobs/nbin))

    with bw per channel in Hz upstream of the caller (the reference passes
    MHz and folds the 1e6 into SCALING; we keep its exact arithmetic).
    """
    return ssys_jy / F.sqrt(2.0 * (bw_mhz / nchan) * (tobs_s / nbin))


def flux_multiplier(
    per_channel_rms: DataFrame,
    expected_rms_col: str,
    window_lo_mhz: float,
    window_hi_mhz: float,
    obs_col: str = "obs_id",
) -> DataFrame:
    """A6+A11 scalar: mult = expected / median(off_rms over window chans).

    Exact ``median`` (Spark >= 3.4), never percentile_approx — the oracle
    hash-match requires np.median semantics (fluxcal_meerkat.py:340).
    """
    return (
        per_channel_rms.filter(
            (F.col("freq") >= window_lo_mhz) & (F.col("freq") < window_hi_mhz)
        )
        .groupBy(obs_col)
        .agg(
            F.median("off_rms").alias("observed_rms"),
            F.first(expected_rms_col).alias("expected_rms"),
        )
        .withColumn("mult", F.col("expected_rms") / F.col("observed_rms"))
    )


def apply_flux(cube: DataFrame, multipliers: DataFrame, obs_col: str = "obs_id", value_col: str = "value") -> DataFrame:
    """A11 apply: broadcast the per-obs scalar and scale every cube value
    (``pam --mult``). Broadcast join — no shuffle of the big side."""
    return (
        cube.join(F.broadcast(multipliers.select(obs_col, "mult")), obs_col, "left")
        .withColumn(value_col, F.col(value_col) * F.coalesce(F.col("mult"), F.lit(1.0)))
        .drop("mult")
    )


def flux_density(
    calibrated: DataFrame,
    on_pulse: F.Column,
    group_cols: tuple[str, ...] = ("obs_id",),
    value_col: str = "value",
    nbin: int | None = None,
) -> DataFrame:
    """Period-averaged flux density of the calibrated profile (the
    ``flux`` field of the results document,
    generate_images_results.py:294): baseline-subtracted on-pulse flux
    averaged over the FULL period,

        flux = ( Σ_on v  −  n_on · mean_off(v) ) / nbin,

    the psrchive ``flux`` convention (mean flux density, not peak).
    Zero-weight cells are excluded from the flux statistics, but the
    denominator is the profile's FIXED bin count — pass ``nbin``
    explicitly, or it is counted over ALL rows (zapped included), so a
    phase bin that happens to be entirely zapped cannot shrink the
    period and inflate the flux. One hash aggregation per obs."""
    w = F.col("weight") > 0
    denom = (
        F.lit(float(nbin))
        if nbin is not None
        else F.count_distinct(F.col("bin")).cast("double")
    )
    return calibrated.groupBy(*group_cols).agg(
        (
            (
                F.sum(F.when(w & on_pulse, F.col(value_col)))
                - F.count(F.when(w & on_pulse, F.col(value_col)))
                * F.avg(F.when(w & ~on_pulse, F.col(value_col)))
            )
            / denom
        ).alias("flux")
    )
