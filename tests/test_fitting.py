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


# ---------------- generalized design-matrix fit (VERDICT r5 #3) ----------------

from meerpipe_spark.operators.fitting import DM_K, fit_timing_model  # noqa: E402

DM_TRUE = 2.64
A1_TRUE = 1.2       # projected semi-major axis, light-seconds
PB_DAYS = 0.4
T0_MJD = 59990.0


def _timing_rows(psr: str, n: int = 240, binary: bool = False, seed: int = 7):
    """Multi-frequency TOAs at exact integer turns of a FULL true model
    (f0, f1, DM, optionally a circular binary): pick integer pulse
    numbers on a time grid, invert the quadratic stably for tc, then
    fixed-point the implicit binary delay to <1e-12 s."""
    rng = np.random.default_rng(seed)
    rows = []
    for i, day in enumerate(np.linspace(-200.0, 200.0, n)):
        f_mhz = 900.0 + (i % 64) * 12.0
        dt = day * 86400.0
        n_turn = np.round(F0_TRUE * dt + 0.5 * F1_TRUE * dt * dt)
        # stable quadratic inversion: tc = 2N/(f0 + sqrt(f0^2 + 2 f1 N))
        tc = 2.0 * n_turn / (F0_TRUE + np.sqrt(F0_TRUE**2 + 2.0 * F1_TRUE * n_turn))
        noise_s = rng.normal(scale=1e-7)
        arrival = tc + DM_K * DM_TRUE / (f_mhz * f_mhz) + noise_s
        mjd = PEPOCH + arrival / 86400.0
        if binary:
            for _ in range(4):  # fixed-point: delay depends on arrival time
                delay = A1_TRUE * np.sin(2.0 * np.pi * (mjd - T0_MJD) / PB_DAYS)
                mjd = PEPOCH + (arrival + delay) / 86400.0
        rows.append(Row(psr=psr, bat_mjd=float(mjd), freq_mhz=f_mhz, err_ns=100.0))
    return rows


def test_timing_model_fit_recovers_four_params(spark):
    """Perturb phase/F0/F1/DM simultaneously; the 4-param design-matrix
    WLS recovers the true model. F0 lands ~1e-15 Hz (≈5e-18 relative —
    far inside the <1e-10 relative gate); DM/F1 to their double-rounding
    floors (phase ulp ~5e-7 turns at N~4e9)."""
    toas = spark.createDataFrame(_timing_rows("J1713+0747"))
    models = spark.createDataFrame(
        [
            Row(
                psr="J1713+0747",
                f0_hz=F0_TRUE + 3e-9,
                f1_hz_s=0.0,
                dm=DM_TRUE - 0.03,
                pepoch_mjd=PEPOCH,
            )
        ]
    )
    r = fit_timing_model(toas, models, params=("phase", "f0", "f1", "dm")).collect()[0]
    assert r.converged and r.n_toa == 240
    assert abs(r.f0_hz - F0_TRUE) / F0_TRUE < 1e-10
    assert abs(r.f0_hz - F0_TRUE) < 1e-12
    assert abs(r.f1_hz_s - F1_TRUE) < 1e-18
    # 100 ns injected noise = 2.2e-5 turns; DM lever arm ~0.4 turns/unit
    assert abs(r.dm - DM_TRUE) < 1e-4
    assert r.wrms_s < 5e-7


def test_timing_model_fit_recovers_binary_a1(spark):
    """5-parameter fit including the circular-binary projected
    semi-major axis A1 (PB, T0 held from the par map)."""
    toas = spark.createDataFrame(_timing_rows("J0437-4715", binary=True))
    models = spark.createDataFrame(
        [
            Row(
                psr="J0437-4715",
                f0_hz=F0_TRUE + 1e-9,
                f1_hz_s=0.0,
                dm=DM_TRUE - 0.02,
                # a1 start error must stay inside the phase-wrap window:
                # f0*da1 < 0.5 turns needs da1 < 2.3e-3 light-s
                a1_s=A1_TRUE - 1e-3,
                pb_days=PB_DAYS,
                t0_mjd=T0_MJD,
                pepoch_mjd=PEPOCH,
            )
        ]
    )
    r = fit_timing_model(
        toas, models, params=("phase", "f0", "f1", "dm", "a1")
    ).collect()[0]
    assert r.converged
    assert abs(r.f0_hz - F0_TRUE) / F0_TRUE < 1e-10
    assert abs(r.dm - DM_TRUE) < 1e-4
    assert abs(r.a1_s - A1_TRUE) < 1e-5
    assert r.wrms_s < 5e-7


def test_timing_model_degenerate_group_isolated(spark):
    """Single-frequency TOAs make the DM column collinear with phase:
    that pulsar comes back converged=False; a healthy co-grouped pulsar
    still fits."""
    bad = [
        Row(psr="BAD", bat_mjd=PEPOCH + i * 0.01, freq_mhz=1400.0, err_ns=100.0)
        for i in range(40)
    ]
    good = _timing_rows("GOOD")
    models = spark.createDataFrame(
        [
            Row(psr="BAD", f0_hz=F0_TRUE, f1_hz_s=0.0, dm=1.0, pepoch_mjd=PEPOCH),
            Row(psr="GOOD", f0_hz=F0_TRUE + 1e-9, f1_hz_s=0.0, dm=DM_TRUE, pepoch_mjd=PEPOCH),
        ]
    )
    out = {
        r.psr: r
        for r in fit_timing_model(
            spark.createDataFrame(bad + good), models
        ).collect()
    }
    assert out["GOOD"].converged
    assert not out["BAD"].converged
    assert out["BAD"].dm == 1.0  # starting model passed through


def test_timing_model_rejects_unknown_param(spark):
    toas = spark.createDataFrame(_timing_rows("X", n=8))
    models = spark.createDataFrame(
        [Row(psr="X", f0_hz=F0_TRUE, f1_hz_s=0.0, dm=1.0, pepoch_mjd=PEPOCH)]
    )
    with pytest.raises(ValueError, match="unknown timing parameter"):
        fit_timing_model(toas, models, params=("phase", "px"))


# ---------------- tempo2 CLI lane with a mock binary (VERDICT r6 #6) ----------


def _mock_tempo2(tmp_path, resid_lines, exit_code=0):
    """A fake tempo2 executable per /root/reference/tempo2_wrapper.sh:28-36
    semantics: parses -outfile from its argv, writes the canned general2
    block ({bat} {post} {err} {freq} {post_phase} lines) there, records
    its full argv for inspection, and exits with the given code."""
    import os
    import stat

    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    exe = bindir / "tempo2"
    arglog = tmp_path / "argv.txt"
    body = "\n".join(resid_lines)
    exe.write_text(
        "#!/bin/bash\n"
        f'printf "%s\\n" "$@" > {arglog}\n'
        "out=\n"
        'while [ $# -gt 0 ]; do\n'
        '  if [ "$1" = "-outfile" ]; then out=$2; shift; fi\n'
        "  shift\n"
        "done\n"
        f'[ -n "$out" ] && cat > "$out" <<"RESID"\n'
        f"{body}\n"
        "RESID\n"
        f"exit {exit_code}\n"
    )
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return str(bindir), arglog


def _toa_pdf():
    import pandas as pd

    return pd.DataFrame(
        {
            "psr": ["J0000+0000"] * 3,
            "bat_mjd": [59000.0, 59001.0, 59002.0],
            "err_ns": [1000.0, 1000.0, 1000.0],
            "f0_hz": [10.0] * 3,
            "f1_hz_s": [-1e-15] * 3,
            "pepoch_mjd": [59001.0] * 3,
        }
    )


def test_tempo2_cli_fitter_mock_invocation_and_parse(tmp_path, monkeypatch):
    """Invocation construction + general2 output parsing, no real tempo2:
    the reference's exact flag set must appear in argv and the canned
    residuals must come back as the weighted RMS."""
    import math
    import os

    bindir, arglog = _mock_tempo2(
        tmp_path,
        # {bat} {post} {err_ns} {freq} {post_phase}
        [
            "59000.0 1.0e-06 1000.0 1400.0 0.00001",
            "59001.0 2.0e-06 1000.0 1400.0 0.00002",
        ],
    )
    monkeypatch.setenv("PATH", bindir + os.pathsep + os.environ["PATH"])
    fit = tempo2_cli_fitter(select_logic="snr > 10")
    out = fit("J0000+0000", _toa_pdf())
    assert out["converged"] is True
    # equal errors: wrms = sqrt(mean(post^2)) = sqrt(2.5)e-6
    assert math.isclose(out["wrms_s"], math.sqrt(2.5) * 1e-6, rel_tol=1e-12)
    argv = arglog.read_text().splitlines()
    # reference invocation (tempo2_wrapper.sh:36): general2 plugin,
    # residual format string, START/FINISH window, -nobs cap, -npsr 1
    assert argv[argv.index("-output") + 1] == "general2"
    assert "{bat} {post} {err} {freq} {post_phase}" in argv[argv.index("-s") + 1]
    assert argv[argv.index("-set") + 1 :][:2] == ["START", "40000.0"]
    assert "-nobs" in argv and argv[argv.index("-nobs") + 1] == "1000000"
    assert argv[argv.index("-npsr") + 1] == "1"
    # -select wired through with the logic file containing the predicate
    sel = argv[argv.index("-select") + 1]
    # the tempdir is gone after the call; the arg must have pointed at a
    # .select file (content was written before invocation)
    assert sel.endswith("logic.select")
    # par/tim handoff: -f <par> <tim> tail
    fidx = argv.index("-f")
    assert argv[fidx + 1].endswith(".par") and argv[fidx + 2].endswith(".tim")


def test_tempo2_cli_fitter_mock_no_data_exit_tolerated(tmp_path, monkeypatch):
    """Exit 134/137 ('no data after selection', tempo2_wrapper.sh:37-42)
    must not raise — the pulsar comes back converged=False."""
    import os

    bindir, _ = _mock_tempo2(tmp_path, [], exit_code=134)
    monkeypatch.setenv("PATH", bindir + os.pathsep + os.environ["PATH"])
    fit = tempo2_cli_fitter()
    out = fit("J0000+0000", _toa_pdf())
    assert out["converged"] is False


def test_tempo2_cli_fitter_mock_real_error_raises(tmp_path, monkeypatch):
    """Any OTHER nonzero exit is a real tempo2 failure and must raise."""
    import os

    import pytest as _pytest

    bindir, _ = _mock_tempo2(tmp_path, [], exit_code=2)
    monkeypatch.setenv("PATH", bindir + os.pathsep + os.environ["PATH"])
    fit = tempo2_cli_fitter()
    with _pytest.raises(RuntimeError, match="tempo2 failed"):
        fit("J0000+0000", _toa_pdf())
