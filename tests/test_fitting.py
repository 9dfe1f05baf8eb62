"""Ephemeris-fitting boundary tests (SURVEY §7.3.7): the native WLS spin
fitter recovers known parameters, the applyInPandas operator isolates
per-pulsar failures, custom fitters plug in, and the tempo2 CLI boundary
fails fast when the binary is absent."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from meerpipe_spark.operators.fitting import (
    fit_ephemeris,
    spin_wls_fitter,
    tempo2_cli_fitter,
)

F0_TRUE = 218.81184385  # J1713+0747-ish spin frequency
F1_TRUE = -4.08e-16
PEPOCH = 60000.0


def _toa_rows(psr: str, f0_start: float, f1_start: float, n: int = 60, seed: int = 1):
    """TOAs at exact integer turns of the TRUE model (plus tiny noise),
    paired with a perturbed STARTING model."""
    rng = np.random.default_rng(seed)
    rows = []
    for day in np.linspace(-200.0, 200.0, n):
        dt = day * 86400.0
        # pull dt onto an integer turn of the true model (one Newton step
        # suffices: f1·dt² is tiny)
        n_turn = np.round(F0_TRUE * dt + 0.5 * F1_TRUE * dt * dt)
        dt_exact = dt - ((F0_TRUE * dt + 0.5 * F1_TRUE * dt * dt) - n_turn) / F0_TRUE
        noise_s = rng.normal(scale=1e-7)
        mjd = PEPOCH + (dt_exact + noise_s) / 86400.0
        rows.append(
            Row(psr=psr, bat_mjd=float(mjd), err_ns=100.0)
        )
    model = Row(psr=psr, f0_hz=f0_start, f1_hz_s=f1_start, pepoch_mjd=PEPOCH)
    return rows, model


def test_spin_wls_recovers_true_parameters(spark):
    toas, model = _toa_rows("J1713+0747", F0_TRUE + 2e-9, F1_TRUE * 0.5)
    out = fit_ephemeris(
        spark.createDataFrame(toas), spark.createDataFrame([model])
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.converged and r.n_toa == 60
    # a 2e-9 Hz f0 error is ~3e-5 turns/day of drift — easily resolvable
    assert abs(r.f0_hz - F0_TRUE) < 1e-11
    assert abs(r.f1_hz_s - F1_TRUE) < 1e-18
    # residuals after fit at the injected-noise floor (100 ns), far below
    # the starting model's drift
    assert r.wrms_s < 5e-7


def test_fit_is_deterministic(spark):
    toas, model = _toa_rows("J0437-4715", F0_TRUE + 1e-9, F1_TRUE)
    df, mdf = spark.createDataFrame(toas), spark.createDataFrame([model])
    a = fit_ephemeris(df, mdf).collect()[0]
    b = fit_ephemeris(df, mdf).collect()[0]
    assert (a.f0_hz, a.f1_hz_s, a.wrms_s) == (b.f0_hz, b.f1_hz_s, b.wrms_s)


def test_failure_isolated_per_pulsar(spark):
    good, gmodel = _toa_rows("GOOD", F0_TRUE + 1e-9, F1_TRUE, seed=2)
    bad, bmodel = _toa_rows("BAD", F0_TRUE, F1_TRUE, seed=3)

    def flaky(psr, pdf):
        if psr == "BAD":
            raise RuntimeError("degenerate design matrix")
        return spin_wls_fitter()(psr, pdf)

    out = {
        r.psr: r
        for r in fit_ephemeris(
            spark.createDataFrame(good + bad),
            spark.createDataFrame([gmodel, bmodel]),
            fitter=flaky,
        ).collect()
    }
    assert out["GOOD"].converged
    assert not out["BAD"].converged  # row emitted, stage not failed
    assert out["BAD"].f0_hz == F0_TRUE  # starting model passed through


def test_custom_fitter_contract(spark):
    """The fitter callable sees (psr, pandas frame with TOAs + starting
    model) and its returned dict lands in the output row."""
    toas, model = _toa_rows("X", 10.0, 0.0, n=5)

    def probe(psr, pdf):
        # runs on the executor: any contract breach raises -> converged
        # comes back False, so a True result PROVES the contract held
        assert psr == "X"
        assert {"bat_mjd", "err_ns", "f0_hz", "f1_hz_s", "pepoch_mjd"} <= set(pdf.columns)
        assert (pdf["pepoch_mjd"] == PEPOCH).all()
        return {"f0_hz": 42.0, "converged": True}

    r = fit_ephemeris(
        spark.createDataFrame(toas), spark.createDataFrame([model]), fitter=probe
    ).collect()[0]
    assert r.f0_hz == 42.0 and r.converged


def test_tempo2_cli_fitter_fails_fast_without_binary():
    import shutil

    if shutil.which("tempo2") is not None:
        pytest.skip("tempo2 present — boundary active")
    with pytest.raises(FileNotFoundError):
        tempo2_cli_fitter()
