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
        orbits = np.floor((r.ecc_anom + np.pi) / (2 * np.pi))
        assert r.nu == pytest.approx(base + 2 * np.pi * orbits, rel=1e-12)
