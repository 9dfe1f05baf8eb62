"""Kepler kernel tests: the Newton solve satisfies Kepler's equation to
machine precision; phases are normalized; the circular shortcut engages."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from meerpipe_spark.functions.kepler import (
    binary_phase,
    binary_phase_circular,
    eccentric_anomaly_udf,
    mean_anomaly,
    true_anomaly,
)


def test_kepler_equation_satisfied(spark):
    rng = np.random.default_rng(11)
    rows = [
        Row(m_anom=float(rng.uniform(-20, 20)), ecc=float(rng.uniform(0, 0.9)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows)
    out = df.withColumn(
        "ecc_anom", eccentric_anomaly_udf(F.col("m_anom"), F.col("ecc"))
    ).collect()
    for r in out:
        assert abs(r.ecc_anom - r.ecc * np.sin(r.ecc_anom) - r.m_anom) < 1e-10, r


def test_circular_shortcut(spark):
    df = spark.createDataFrame([Row(m_anom=1.234, ecc=1e-6)])
    out = df.withColumn(
        "ecc_anom", eccentric_anomaly_udf(F.col("m_anom"), F.col("ecc"))
    ).collect()[0]
    assert out.ecc_anom == 1.234  # E = M exactly for e < 1e-4


def test_binary_phase_in_unit_interval(spark):
    rng = np.random.default_rng(5)
    df = spark.createDataFrame([Row(t=float(rng.uniform(58000, 60000))) for _ in range(100)])
    out = df.select(
        binary_phase(F.col("t"), F.lit(59000.0), F.lit(5.7), F.lit(0.3)).alias("ph"),
        binary_phase_circular(F.col("t"), F.lit(59000.0), F.lit(5.7)).alias("phc"),
    ).collect()
    for r in out:
        assert 0.0 <= r.ph < 1.0
        assert 0.0 <= r.phc < 1.0


def test_pbdot_drift_changes_phase(spark):
    df = spark.createDataFrame([Row(t=59500.0)])
    out = df.select(
        mean_anomaly(F.col("t"), F.lit(59000.0), F.lit(5.7)).alias("m0"),
        mean_anomaly(F.col("t"), F.lit(59000.0), F.lit(5.7), F.lit(1e-7)).alias("m1"),
    ).collect()[0]
    assert out.m0 != out.m1
    # drift term is small and negative for positive PBDOT
    assert out.m1 < out.m0


def test_true_anomaly_matches_numpy(spark):
    rng = np.random.default_rng(13)
    rows = [
        Row(ecc_anom=float(rng.uniform(-10, 10)), ecc=float(rng.uniform(0, 0.9)))
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows)
    out = df.withColumn("nu", true_anomaly(F.col("ecc_anom"), F.col("ecc"))).collect()
    for r in out:
        base = 2.0 * np.arctan2(
            np.sqrt(1 + r.ecc) * np.sin(r.ecc_anom / 2),
            np.sqrt(1 - r.ecc) * np.cos(r.ecc_anom / 2),
        )
        if base < 0:
            base += 2 * np.pi  # reference wraps negatives up (binary_tools.py:271-275)
        orbits = np.floor_divide(r.ecc_anom, 2 * np.pi)
        assert r.nu == pytest.approx(base + 2 * np.pi * orbits, rel=1e-9)


# ---------------------------------------------------------------------------
# Parameter-map-driven chain vs a direct numpy implementation of the
# reference semantics (binary_tools.py:76-298)
# ---------------------------------------------------------------------------

def fsolve(fn, x0, full_output=False):
    """Newton solve of Kepler's equation (scipy absent in container; the
    solve itself is independently validated by the equation-residual
    test above)."""
    E = np.asarray(x0, dtype=np.float64).copy()
    for _ in range(60):
        # fn(E) = E - ecc*sin(E) - M ; derivative wrt E of that form:
        f = fn(E)
        h = 1e-7
        fp = (fn(E + h) - f) / h
        E = E - f / fp
    return E


from meerpipe_spark.functions.kepler import (
    binary_phase_from_pars,
    ell1_arctan,
    is_binary,
    mean_anomaly_from_pars,
    t0_from_pars,
)


def _np_binphase(mjds, pars):
    """Sequential numpy implementation of the reference chain."""
    two_pi = 2 * np.pi
    # T0 / OMB / ECC
    if "PB" in pars:
        omb = two_pi / pars["PB"]
    else:
        omb = two_pi * pars["FB0"] * 86400.0
    if "TASC" in pars:
        if "EPS1" in pars and "EPS2" in pars:
            e1, e2 = pars["EPS1"], pars["EPS2"]
            if e2 == 0:
                at = np.pi / 2 if e1 > 0 else (-np.pi / 2 if e1 < 0 else 0.0)
            else:
                at = np.arctan(e1 / e2)
                if e2 < 0:
                    at += np.pi
            at = np.fmod(at + two_pi, two_pi)
            t0 = pars["TASC"] + at / omb
            om0 = np.fmod(at, two_pi)
            ecc = np.hypot(e1, e2)
        else:
            t0, om0, ecc = pars["TASC"], 0.0, 0.0
    else:
        t0 = pars["T0"]
        om0 = pars.get("OM", 0.0) * np.pi / 180
        ecc = pars.get("ECC", 0.0)
    # mean anomaly
    dt = mjds - t0
    if "PB" in pars:
        pbdot = pars.get("PBDOT", 0.0)
        if abs(pbdot) > 1e-6:
            pbdot *= 1e-12
        M = omb * (dt - 0.5 * (pbdot / pars["PB"]) * dt**2)
    else:
        M = np.zeros_like(mjds)
        i = 0
        import math as _m

        while f"FB{i}" in pars:
            M = M + pars[f"FB{i}"] * dt ** (i + 1) / _m.factorial(i + 1)
            i += 1
        M = M * two_pi * 86400.0
    # eccentric + true anomaly
    if ecc < 1e-4:
        E = M
    else:
        E = fsolve(lambda E: E - ecc * np.sin(E) - M, M, full_output=False)
    U = 2 * np.arctan2(np.sqrt(1 + ecc) * np.sin(E / 2), np.sqrt(1 - ecc) * np.cos(E / 2))
    U = np.where(U < 0, U + two_pi, U)
    U = U + np.floor_divide(E, two_pi) * two_pi
    omdot = pars.get("OMDOT", 0.0) * (np.pi / 180) / 365.25
    OM = om0 + omdot * U / omb
    Un = np.fmod(U, two_pi)
    return np.fmod(Un + OM + two_pi, two_pi) / two_pi


PAR_SETS = [
    {"BINARY": "DD", "PB": 5.741, "T0": 59000.25, "ECC": 0.3, "OM": 45.0, "OMDOT": 0.02},
    {"BINARY": "ELL1", "PB": 2.35, "TASC": 59123.4, "EPS1": 3e-5, "EPS2": -2e-5},
    {"BINARY": "ELL1", "FB0": 2.1e-6, "FB1": -1e-18, "TASC": 58900.0,
     "EPS1": 1e-6, "EPS2": 0.0},
    {"BINARY": "BT", "PB": 12.3, "T0": 59500.0, "ECC": 0.62, "PBDOT": 4.2},  # tempo-format
]


@pytest.mark.parametrize("pars", PAR_SETS)
def test_binary_phase_from_pars_matches_reference_chain(spark, pars):
    rng = np.random.default_rng(21)
    mjds = rng.uniform(59000, 59400, 50)
    df = spark.createDataFrame([Row(t=float(t)) for t in mjds])
    got = (
        df.select(F.col("t"), binary_phase_from_pars(F.col("t"), pars).alias("ph"))
        .toPandas()
        .set_index("t")["ph"]
    )
    expect = _np_binphase(mjds, pars)
    for t, e in zip(mjds, expect):
        assert got[t] == pytest.approx(e, abs=1e-8), (pars, t)
        assert 0.0 <= got[t] < 1.0


def test_ell1_arctan_branches():
    assert ell1_arctan(1.0, 0.0) == pytest.approx(np.pi / 2)
    assert ell1_arctan(-1.0, 0.0) == pytest.approx(3 * np.pi / 2)
    assert ell1_arctan(0.0, 0.0) == 0.0
    assert ell1_arctan(1.0, -1.0) == pytest.approx(np.arctan(-1.0) + np.pi)
    assert 0 <= ell1_arctan(-3e-5, -2e-5) < 2 * np.pi


def test_is_binary_truth_table():
    assert is_binary({"BINARY": "DD", "PB": 1.0, "T0": 59000.0})
    assert is_binary({"BINARY": "ELL1", "FB0": 1e-6, "TASC": 59000.0})
    assert not is_binary({"PB": 1.0, "T0": 59000.0})          # no BINARY flag
    assert not is_binary({"BINARY": "DD", "T0": 59000.0})      # no period
    assert not is_binary({"BINARY": "DD", "PB": 1.0})          # no epoch


def test_tempo_format_pbdot_normalized(spark):
    df = spark.createDataFrame([Row(t=59500.0)])
    raw = {"PB": 12.3, "T0": 59000.0, "PBDOT": 4.2e-12}
    tempo = {"PB": 12.3, "T0": 59000.0, "PBDOT": 4.2}  # tempo format
    m_raw = df.select(mean_anomaly_from_pars(F.col("t"), raw).alias("m")).collect()[0].m
    m_tempo = df.select(mean_anomaly_from_pars(F.col("t"), tempo).alias("m")).collect()[0].m
    assert m_raw == pytest.approx(m_tempo, rel=1e-14)


def test_ell1_t0_shift():
    pars = {"PB": 2.0, "TASC": 59000.0, "EPS1": 1e-5, "EPS2": 1e-5}
    t0 = t0_from_pars(pars)
    expect = 59000.0 + ell1_arctan(1e-5, 1e-5) / (2 * np.pi / 2.0)
    assert t0 == pytest.approx(expect)
