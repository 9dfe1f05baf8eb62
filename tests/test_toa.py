"""TOA-layer tests: template matching recovers known phase shifts;
selection logic; residual statistics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.phase import phase_norm
from meerpipe_spark.operators.toa import residual_stats, template_match_toas, toa_select

NBIN = 64


def _gauss_profile(center_phase: float, width: float = 0.05, amp: float = 20.0):
    phases = (np.arange(NBIN) + 0.5) / NBIN
    d = np.minimum(np.abs(phases - center_phase), 1 - np.abs(phases - center_phase))
    return amp * np.exp(-0.5 * (d / width) ** 2)


def test_template_match_recovers_shifts(spark):
    rng = np.random.default_rng(31)
    template = _gauss_profile(0.5)
    true_shifts = {0: 0.0, 1: 0.125, 2: 0.43751, 3: 0.9}
    rows = []
    for subint, shift in true_shifts.items():
        prof = _gauss_profile((0.5 + shift) % 1.0) + rng.normal(0, 0.3, NBIN)
        for b in range(NBIN):
            rows.append(Row(obs_id="o1", subint=subint, chan=0, bin=b, value=float(prof[b])))
    profiles = spark.createDataFrame(rows)
    out = {
        r.subint: r
        for r in template_match_toas(profiles, template.tolist(), nchan=1).collect()
    }
    for subint, shift in true_shifts.items():
        got = out[subint].phase_shift
        # circular distance to the truth within half a bin
        d = min(abs(got - shift), 1 - abs(got - shift))
        assert d < 0.5 / NBIN, (subint, got, shift)
        # correlation-quality indicator (not profile S/N): clearly >0 for
        # a real detection — the xc of broad Gaussians has wide wings, so
        # this sits lower than the A7 profile S/N would
        assert out[subint].snr > 2

def test_template_match_chan_groups(spark):
    template = _gauss_profile(0.5)
    rows = []
    for chan in range(4):
        prof = _gauss_profile(0.5 if chan < 2 else 0.75)
        for b in range(NBIN):
            rows.append(Row(obs_id="o1", subint=0, chan=chan, bin=b, value=float(prof[b])))
    profiles = spark.createDataFrame(rows)
    out = {
        r.chan_group: r.phase_shift
        for r in template_match_toas(profiles, template.tolist(), chan_groups=2, nchan=4).collect()
    }
    assert len(out) == 2
    assert min(abs(out[0]), 1 - abs(out[0])) < 0.5 / NBIN        # group 0 unshifted
    d1 = min(abs(out[1] - 0.25), 1 - abs(out[1] - 0.25))
    assert d1 < 0.5 / NBIN                                        # group 1 shifted by 0.25


def test_toa_select_and_residual_stats(spark):
    rows = [
        Row(psr="A", bat_mjd=59000.5, residual_s=1e-6, err_ns=100.0, snr=50.0),
        Row(psr="A", bat_mjd=59001.5, residual_s=-1e-6, err_ns=100.0, snr=9.0),   # rejected
        Row(psr="A", bat_mjd=30000.0, residual_s=0.0, err_ns=100.0, snr=50.0),    # out of MJD window
        Row(psr="A", bat_mjd=59002.5, residual_s=2e-6, err_ns=200.0, snr=12.0),
    ]
    toas = spark.createDataFrame(rows)
    kept = toa_select(toas)
    assert kept.count() == 2
    stats = residual_stats(kept).collect()[0]
    assert stats.n_toa == 2
    # wrms = sqrt( sum(r^2/e^2)/sum(1/e^2) ) with errors in seconds
    w1, w2 = 1 / (100e-9) ** 2, 1 / (200e-9) ** 2
    expect = np.sqrt((w1 * (1e-6) ** 2 + w2 * (2e-6) ** 2) / (w1 + w2))
    assert stats.wrms_s == pytest.approx(expect, rel=1e-12)


def test_evaluate_residuals_recovers_offsets(spark):
    from meerpipe_spark.operators.toa import evaluate_residuals

    f0 = 100.0  # Hz -> period 10 ms
    pepoch = 59000.0
    # TOAs exactly on integer turns, plus one offset by +1 ms
    base = [pepoch + k * 1000.0 / 86400.0 for k in range(1, 4)]  # integer turns
    offset_mjd = pepoch + (1000.0 + 1e-3) / 86400.0  # +1 ms late
    rows = [Row(psr="A", bat_mjd=float(m)) for m in base] + [
        Row(psr="A", bat_mjd=float(offset_mjd))
    ]
    out = evaluate_residuals(
        spark.createDataFrame(rows), F.lit(f0), F.lit(pepoch)
    ).collect()
    res = sorted(abs(r.residual_s) for r in out)
    # double MJD resolution near 59000 is ~0.6 us (eps*59000*86400) — this
    # is precisely why SURVEY §7.3.1 mandates DecimalType(38,19) for
    # sub-ns paths; at double precision on-turn residuals land ~1e-6 s
    for r in res[:3]:
        assert r < 2e-6  # on-turn TOAs -> zero residual (double precision)
    assert res[3] == pytest.approx(1e-3, abs=2e-6)  # the 1 ms offset recovered


def test_evaluate_residuals_with_spindown(spark):
    from meerpipe_spark.operators.toa import evaluate_residuals

    f0, f1, pepoch = 50.0, -1e-10, 59000.0
    dt = 5000.0  # seconds
    # choose a TOA whose pulse number is exactly integer under (f0, f1)
    n_exact = f0 * dt + 0.5 * f1 * dt * dt
    dt_adj = dt + (round(n_exact) - n_exact) / (f0 + f1 * dt)
    toa = pepoch + dt_adj / 86400.0
    out = evaluate_residuals(
        spark.createDataFrame([Row(bat_mjd=float(toa))]),
        F.lit(f0), F.lit(pepoch), F.lit(f1),
    ).collect()[0]
    assert abs(out.residual_s) < 2e-6  # double-MJD resolution floor


def test_toa_dm_pipeline_recovers_injected_dispersion(spark, sf_dir):
    """The composed profiles→TOAs→DM-fit pipeline recovers the injected
    per-obs dispersion coefficients (20/30/40) within the sub-bin
    estimator's bias budget, and the per-subint base delay tracks the
    injected 0.12/0.17-turn offsets."""
    from meerpipe_spark.queries import QUERIES

    rows = QUERIES["toa_dm_pipeline_e2e"].fn(spark, sf_dir).collect()
    want = {"A": 20.0, "N": 30.0, "R": 40.0}
    assert len(rows) == 6
    for r in rows:
        assert abs(r.dmcoef_fit - want[r.obs_id]) / want[r.obs_id] < 0.1
        # base = (0.12 + 0.05*subint) turns / f0 in ms
        expect_ms = (0.12 + 0.05 * r.subint) / 218.81184385 * 1e3
        assert abs(r.base_ms - expect_ms) < 0.05
        assert r.tres_us < 20.0
