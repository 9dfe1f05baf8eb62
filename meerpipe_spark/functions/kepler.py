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
    """ν = 2·atan2(√(1+e)·sin(E/2), √(1−e)·cos(E/2)) — pure expression
    (binary_tools.py:258-282), plus the orbit-count continuation term so
    ν tracks the same revolution as E."""
    half = ecc_anom / 2.0
    nu = 2.0 * F.atan2(
        F.sqrt(1.0 + ecc) * F.sin(half),
        F.sqrt(1.0 - ecc) * F.cos(half),
    )
    # atan2 wraps to (−π, π]; add back the whole-orbit count from E.
    orbits = F.floor((ecc_anom + float(np.pi)) / (2.0 * float(np.pi)))
    return nu + 2.0 * float(np.pi) * orbits


def binary_phase(t_mjd: Column, t0_mjd: Column, pb_days: Column, ecc: Column, pbdot: Column | None = None) -> Column:
    """Full orbital phase ∈ [0,1): mean anomaly → (Kepler solve) → phase.

    Composition helper: callers needing the true anomaly chain use the
    pieces; orbital *phase* only needs M normalized (the reference's
    get_binphase returns fmod(M/2π, 1), binary_tools.py:76-87).
    """
    return phase_norm(mean_anomaly(t_mjd, t0_mjd, pb_days, pbdot) / (2.0 * float(np.pi)), 1.0)
