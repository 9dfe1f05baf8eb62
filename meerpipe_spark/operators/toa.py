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


# ---------------------------------------------------------------------------
# M6: TOA generation — template matching per decimated profile
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, types as T

TOA_SCHEMA = T.StructType(
    [
        T.StructField("obs_id", T.StringType()),
        T.StructField("subint", T.LongType()),
        T.StructField("chan_group", T.LongType()),
        T.StructField("phase_shift", T.DoubleType()),
        T.StructField("phase_err", T.DoubleType()),
        T.StructField("snr", T.DoubleType()),
    ]
)


def template_match_toas(
    profiles: DataFrame,
    template: list[float],
    chan_groups: int = 1,
    nchan: int = 1,
    value_col: str = "value",
) -> DataFrame:
    """Phase offsets of folded profiles against a template — the native
    replacement for tempo2's ToA extraction step (tempo2_wrapper.sh:36;
    docs/pipeline_workflow.md 'Create ToAs').

    Input: long-form (obs_id, subint, chan, bin, value) rows of the
    DECIMATED product (A1 output). Profiles are grouped into
    ``chan_groups`` frequency groups; each group's summed profile is
    matched by circular FFT cross-correlation with parabolic sub-bin
    refinement. Grouped-map pandas UDF: the per-group profile is tiny
    (nbin doubles) while the number of (obs × subint × group) cells is
    huge — the correct axis of parallelism. The template ships inside the
    closure (broadcast by value).

    Returns (obs_id, subint, chan_group, phase_shift ∈ [0,1),
    phase_err, snr). TOA = subint epoch + phase_shift·period (caller
    composes with the decimal-MJD utilities).
    """
    tpl = np.asarray(template, dtype=np.float64)
    tpl = tpl - tpl.mean()
    nbin = len(tpl)
    group_width = max(1, nchan // chan_groups)

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        obs_id = pdf["obs_id"].iloc[0]
        pdf = pdf.copy()
        pdf["chan_group"] = pdf["chan"] // group_width
        for (subint, cg), grp in pdf.groupby(["subint", "chan_group"]):
            prof = (
                grp.groupby("bin")[value_col].sum().reindex(range(nbin), fill_value=0.0)
            ).to_numpy()
            prof = prof - prof.mean()
            # circular cross-correlation via FFT
            xc = np.fft.irfft(np.fft.rfft(prof) * np.conj(np.fft.rfft(tpl)), n=nbin)
            k = int(np.argmax(xc))
            # parabolic refinement around the peak
            ym, y0, yp = xc[(k - 1) % nbin], xc[k], xc[(k + 1) % nbin]
            denom = ym - 2 * y0 + yp
            frac = 0.5 * (ym - yp) / denom if denom != 0 else 0.0
            shift = ((k + frac) % nbin) / nbin
            # error from correlation curvature vs off-peak noise
            off = np.delete(xc, [(k - 1) % nbin, k, (k + 1) % nbin])
            noise = off.std() or 1.0
            snr = (y0 - off.mean()) / noise
            err = 1.0 / (2.0 * np.pi * max(snr, 1e-9))
            out.append((obs_id, int(subint), int(cg), float(shift), float(err), float(snr)))
        return pd.DataFrame(
            out,
            columns=["obs_id", "subint", "chan_group", "phase_shift", "phase_err", "snr"],
        )

    return profiles.groupBy("obs_id").applyInPandas(match, TOA_SCHEMA)


def evaluate_residuals(
    toas: DataFrame,
    f0_hz: Column,
    pepoch_mjd: Column,
    f1_hz_s: Column | None = None,
    mjd_col: str = "bat_mjd",
) -> DataFrame:
    """M6: timing-residual EVALUATION against a fixed spin model — the
    non-fitting half of tempo2's job (SURVEY §7.3.7: residual evaluation
    is reimplemented natively; only FITTING would stay external).

    Pulse number N(t) = f0·Δt + ½·f1·Δt² (Δt in seconds from PEPOCH);
    the residual is the distance to the nearest integer turn, in seconds:

        r = wrap(N − round(N)) / f0        with wrap into [−0.5, 0.5)

    Pure column expressions; for sub-ns fidelity feed a
    DecimalType(38,19) mjd column (timeutils.mjd_compose) — the phase
    subtraction N − round(N) keeps only the small fractional part, so
    double arithmetic downstream of the decimal Δt is exact enough.
    """
    dt_s = (F.col(mjd_col).cast("double") - pepoch_mjd) * 86400.0
    n = f0_hz * dt_s
    if f1_hz_s is not None:
        n = n + 0.5 * f1_hz_s * dt_s * dt_s
    frac = n - F.round(n)
    return toas.withColumn("phase_residual", frac).withColumn(
        "residual_s", frac / f0_hz
    )
