"""Binary-orbit (Kepler) functions — the reference's signature numeric
kernel, re-expressed Spark-first.

Reference semantics: meerpipe/binary_tools.py (SURVEY.md §2.9) —
get_binphase :76-87, get_omega :113-146, get_mean_anomaly :195-234,
get_eccentric_anomaly :236-256 (scipy fsolve Kepler solve with a
circular shortcut for e < 1e-4), get_true_anomaly :258-282.

Design split:
- everything algebraic (mean anomaly, true anomaly, phase normalization)
  is a JVM column expression → whole-stage codegen, no Python;
- ONLY the transcendental Kepler solve (E - e·sinE = M) is a
  pandas UDF — Arrow-vectorized Newton iteration with a fixed iteration
  count for determinism (SURVEY.md §7.3.4). numpy.sin/cos over the whole
  Arrow batch; ~10^7 rows/s/core, embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

from meerpipe_spark.operators.phase import phase_norm

SECONDS_PER_DAY = 86400.0


def mean_anomaly(t_mjd: Column, t0_mjd: Column, pb_days: Column, pbdot: Column | None = None) -> Column:
    """M = 2π [ (t−T0)/PB − ½ (PBDOT/PB²)(t−T0)² ] (days), in radians.

    The PBDOT quadratic term matches the reference's orbital-frequency
    drift (binary_tools.py:195-219); pass None for a constant period.
    """
    dt = t_mjd - t0_mjd
    cycles = dt / pb_days
    if pbdot is not None:
        cycles = cycles - 0.5 * (pbdot / (pb_days * pb_days)) * dt * dt
    return 2.0 * float(np.pi) * cycles


def binary_phase_circular(t_mjd: Column, t0_mjd: Column, pb_days: Column) -> Column:
    """Orbital phase ∈ [0,1) for a circular orbit — closed form, pure
    expression (the e < 1e-4 shortcut of binary_tools.py:248-250)."""
    return phase_norm((t_mjd - t0_mjd) / pb_days, 1.0)


def _solve_kepler(mean_anom: pd.Series, ecc: pd.Series) -> pd.Series:
    """Solve Kepler's equation E − e·sin E = M per row.

    Newton–Raphson with E₀ = M and a FIXED 30 iterations so results are
    bit-deterministic across partitionings (machine precision is reached
    in < 10 iterations for e < 0.95). Circular shortcut: e < 1e-4 → E = M.
    """
    M = np.asarray(mean_anom, dtype=np.float64)
    e = np.asarray(ecc, dtype=np.float64)
    E = M.copy()
    mask = e >= 1e-4
    for _ in range(30):
        f = E - e * np.sin(E) - M
        fp = 1.0 - e * np.cos(E)
        step = np.where(mask, f / fp, 0.0)
        E = E - step
    return pd.Series(np.where(mask, E, M))


_kepler_udf = None


def eccentric_anomaly_udf(mean_anom: Column, ecc: Column) -> Column:
    """Arrow-vectorized Kepler solve. The pandas UDF is registered lazily
    (pandas_udf needs an active SparkSession to parse its return type)."""
    global _kepler_udf
    if _kepler_udf is None:
        _kepler_udf = pandas_udf(_solve_kepler, "double")
    return _kepler_udf(mean_anom, ecc)


def true_anomaly(ecc_anom: Column, ecc: Column) -> Column:
    """ν = 2·atan2(√(1+e)·sin(E/2), √(1−e)·cos(E/2)) — pure expression,
    with the reference's exact continuation convention
    (binary_tools.py:258-282): wrap negatives up into [0, 2π), then add
    the whole-orbit count floor_divide(E, 2π)."""
    half = ecc_anom / 2.0
    nu = 2.0 * F.atan2(
        F.sqrt(1.0 + ecc) * F.sin(half),
        F.sqrt(1.0 - ecc) * F.cos(half),
    )
    two_pi = 2.0 * float(np.pi)
    nu = F.when(nu < 0, nu + two_pi).otherwise(nu)
    return nu + F.floor(ecc_anom / two_pi) * two_pi


def binary_phase(t_mjd: Column, t0_mjd: Column, pb_days: Column, ecc: Column, pbdot: Column | None = None) -> Column:
    """Full orbital phase ∈ [0,1): mean anomaly → (Kepler solve) → phase.

    Composition helper: callers needing the true anomaly chain use the
    pieces; orbital *phase* only needs M normalized (the reference's
    get_binphase returns fmod(M/2π, 1), binary_tools.py:76-87).
    """
    return phase_norm(mean_anomaly(t_mjd, t0_mjd, pb_days, pbdot) / (2.0 * float(np.pi)), 1.0)


# ---------------------------------------------------------------------------
# Parameter-map-driven chain (the reference's dict-of-par-values API,
# binary_tools.py:76-298): scalar model resolution in Python, per-MJD math
# as column expressions / the Kepler-solve UDF.
# ---------------------------------------------------------------------------

DAYS_PER_YEAR = 365.25
TWO_PI = 2.0 * float(np.pi)


def ell1_arctan(eps1: float, eps2: float) -> float:
    """Degeneracy-safe arctan(EPS1/EPS2) ∈ [0, 2π) for the ELL1 model
    (binary_tools.py:89-111): π/2 branches when EPS2==0, +π correction
    in the EPS2<0 half-plane."""
    import math

    if eps2 == 0:
        at = math.pi / 2 if eps1 > 0 else (-math.pi / 2 if eps1 < 0 else 0.0)
    else:
        at = math.atan(eps1 / eps2)
        if eps2 < 0:
            at += math.pi
    return (at + TWO_PI) % TWO_PI


def omb_from_pars(pars: dict) -> float:
    """Orbital angular frequency in rad/day from PB (days) or FB0 (Hz)
    (binary_tools.py:148-159)."""
    if "PB" in pars:
        return TWO_PI / float(pars["PB"])
    return TWO_PI * float(pars["FB0"]) * 86400.0


def ecc_from_pars(pars: dict) -> float:
    """Model-dependent eccentricity (binary_tools.py:160-176): ELL1 uses
    |EPS|; BT/DD uses ECC; 0 otherwise."""
    import math

    if "TASC" in pars:
        if "EPS1" in pars and "EPS2" in pars:
            return math.sqrt(float(pars["EPS1"]) ** 2 + float(pars["EPS2"]) ** 2)
        return 0.0
    return float(pars.get("ECC", 0.0))


def t0_from_pars(pars: dict) -> float:
    """Model-dependent epoch (binary_tools.py:178-192): ELL1 shifts TASC
    by the ELL1 arctan over OMB; else TASC or T0 directly."""
    if "TASC" in pars:
        if "EPS1" in pars and "EPS2" in pars:
            return float(pars["TASC"]) + ell1_arctan(
                float(pars["EPS1"]), float(pars["EPS2"])
            ) / omb_from_pars(pars)
        return float(pars["TASC"])
    return float(pars["T0"])


def mean_anomaly_from_pars(t_mjd: Column, pars: dict) -> Column:
    """Reference get_mean_anomaly (binary_tools.py:194-234): PB path with
    tempo-format PBDOT normalization (|PBDOT|>1e-6 → ×1e-12), or the
    integrated FB-series Taylor sum (unrolled over the FB_i present)."""
    import math

    t0 = t0_from_pars(pars)
    dt = t_mjd - F.lit(t0)
    if "PB" in pars:
        pb = float(pars["PB"])
        pbdot = float(pars.get("PBDOT", 0.0))
        if abs(pbdot) > 1e-6:
            pbdot *= 1e-12
        omb = omb_from_pars(pars)
        return omb * (dt - 0.5 * (pbdot / pb) * dt * dt)
    m: Column = F.lit(0.0)
    i = 0
    while f"FB{i}" in pars:
        m = m + float(pars[f"FB{i}"]) * F.pow(dt, i + 1) / math.factorial(i + 1)
        i += 1
    return m * TWO_PI * 86400.0


def true_anomaly_from_pars(t_mjd: Column, pars: dict) -> Column:
    """Mean anomaly → (Kepler solve unless e<1e-4) → true anomaly."""
    m = mean_anomaly_from_pars(t_mjd, pars)
    ecc = ecc_from_pars(pars)
    if ecc < 1e-4:
        e_anom = m
    else:
        e_anom = eccentric_anomaly_udf(m, F.lit(ecc))
    return true_anomaly(e_anom, F.lit(ecc))


def omega_expr(pars: dict, u: Column) -> Column:
    """Instantaneous periastron angle incl. OMDOT drift
    (binary_tools.py:113-146): reference OM from ELL1 arctan / OM deg /
    0, plus OMDOT (deg/yr → rad/day) scaled by U/OMB."""
    import math

    if "TASC" in pars:
        om0 = (
            ell1_arctan(float(pars["EPS1"]), float(pars["EPS2"]))
            if "EPS1" in pars and "EPS2" in pars
            else 0.0
        )
        om0 = om0 % TWO_PI
    else:
        om0 = float(pars.get("OM", 0.0)) * math.pi / 180.0
    omdot = float(pars.get("OMDOT", 0.0)) * (math.pi / 180.0) / DAYS_PER_YEAR
    return F.lit(om0) + F.lit(omdot) * u / F.lit(omb_from_pars(pars))


def binary_phase_from_pars(t_mjd: Column, pars: dict) -> Column:
    """Reference get_binphase (binary_tools.py:76-87): orbital phase ∈
    [0,1) from the true anomaly and instantaneous omega."""
    u = true_anomaly_from_pars(t_mjd, pars)
    om = omega_expr(pars, u)
    u_norm = u % TWO_PI  # fmod — sign follows u, matching np.fmod
    return phase_norm(u_norm + om, TWO_PI) / TWO_PI


def is_binary(pars: dict) -> bool:
    """binary_tools.py:284-298 truth table."""
    return (
        "BINARY" in pars
        and ("PB" in pars or "FB0" in pars)
        and ("TASC" in pars or "T0" in pars)
    )
