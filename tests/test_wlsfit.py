"""Native DM / RM fits (operators/wlsfit.py): parameter recovery,
error-bar formulas, and plan shape (one hash aggregation, no UDF)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from meerpipe_spark.operators.wlsfit import (
    DM_K,
    fit_dm,
    fit_rm,
    lambda_sq_m2,
    position_angle,
    wls_solve,
    wls_sufficient_stats,
)


def _toas(spark, ddm, offset, dm0, noise_ns=0.0):
    rows = []
    for i in range(256):
        f = 900.0 + (i % 64) * 12.0
        x = DM_K / (f * f)
        noise = noise_ns * 1e-9 * math.sin(i * 0.7)
        rows.append(
            (
                "J0437-4715",
                f,
                offset + ddm * x + noise,
                (1 + i % 3) * 1e-7,
                dm0,
                59000.0 + i * 0.25,
            )
        )
    return spark.createDataFrame(
        rows, ["psr", "f", "resid_s", "err_s", "dm0", "mjd"]
    )


def test_dm_fit_exact_recovery(spark):
    """Zero noise: the fitted DM equals dm0 + injected ΔDM to <1e-10
    relative, tres ~ 0, chi2r ~ 0; dm_epoch is the weighted-mean MJD."""
    ddm, offset, dm0 = 0.00375, 1.5e-6, 23.5
    fit = fit_dm(
        _toas(spark, ddm, offset, dm0),
        ["psr"],
        F.col("f"),
        F.col("resid_s"),
        F.col("err_s"),
        F.col("dm0"),
        F.col("mjd"),
    ).collect()[0]
    assert fit.dm == pytest.approx(dm0 + ddm, rel=1e-10)
    assert fit.dm_tres < 1e-6  # µs
    assert fit.dm_chi2r < 1e-12
    assert 59000.0 < fit.dm_epoch < 59064.0


def test_dm_fit_error_bar_matches_numpy_wls(spark):
    """With noise: dm/dm_err/chi2r match an independent numpy WLS."""
    ddm, offset, dm0 = -0.002, 5e-7, 18.0
    df = _toas(spark, ddm, offset, dm0, noise_ns=50.0)
    fit = fit_dm(
        df, ["psr"], F.col("f"), F.col("resid_s"), F.col("err_s"),
        F.col("dm0"), F.col("mjd"),
    ).collect()[0]

    pdf = df.toPandas()
    x = DM_K / (pdf["f"].to_numpy() ** 2)
    y = pdf["resid_s"].to_numpy()
    w = 1.0 / pdf["err_s"].to_numpy() ** 2
    A = np.stack([np.ones_like(x), x], axis=1)
    cov = np.linalg.inv(A.T @ (A * w[:, None]))
    sol = cov @ (A * w[:, None]).T @ y
    res = y - A @ sol
    assert fit.dm == pytest.approx(dm0 + sol[1], rel=1e-9)
    assert fit.dm_err == pytest.approx(math.sqrt(cov[1, 1]), rel=1e-9)
    assert fit.dm_chi2r == pytest.approx(
        float(np.sum(w * res**2)) / (len(x) - 2), rel=1e-9
    )
    assert fit.dm_tres == pytest.approx(
        math.sqrt(float(np.sum(w * res**2) / np.sum(w))) * 1e6, rel=1e-9
    )


def test_rm_fit_exact_recovery(spark):
    """Q/U synthesized on a true Faraday law: fit_rm recovers RM and PA₀
    to <1e-9 (atan2∘(sin,cos) round-trip is exact to ulp)."""
    rm_t, pa0_t = 4.25, 0.15
    rows = []
    for i in range(128):
        f = 900.0 + i * 6.0
        lam2 = (299792458.0 / (f * 1e6)) ** 2
        th = pa0_t + rm_t * lam2
        rows.append(("obsA", f, math.cos(2 * th), math.sin(2 * th), 0.01))
    df = spark.createDataFrame(rows, ["obs", "f", "q", "u", "pa_err"])
    fit = fit_rm(
        df, ["obs"], F.col("f"), F.col("q"), F.col("u"), F.col("pa_err")
    ).collect()[0]
    assert fit.rm == pytest.approx(rm_t, rel=1e-9)
    assert fit.pa0 == pytest.approx(pa0_t, rel=1e-9)
    assert fit.rm_chi2r < 1e-15


def test_rm_fit_weighted_slope_matches_numpy(spark):
    """Unequal weights + noise: rm/rm_err match numpy WLS on the same
    PA measurements."""
    rng_vals = [math.sin(i * 1.3) * 0.02 for i in range(128)]
    rows = []
    for i in range(128):
        f = 900.0 + i * 6.0
        lam2 = (299792458.0 / (f * 1e6)) ** 2
        th = 0.1 + 2.5 * lam2 + rng_vals[i]
        rows.append(("obsA", f, math.cos(2 * th), math.sin(2 * th), (1 + i % 4) * 0.01))
    df = spark.createDataFrame(rows, ["obs", "f", "q", "u", "pa_err"])
    fit = fit_rm(
        df, ["obs"], F.col("f"), F.col("q"), F.col("u"), F.col("pa_err")
    ).collect()[0]

    x = np.array([(299792458.0 / ((900.0 + i * 6.0) * 1e6)) ** 2 for i in range(128)])
    y = np.array([0.1 + 2.5 * x[i] + rng_vals[i] for i in range(128)])
    w = 1.0 / np.array([(1 + i % 4) * 0.01 for i in range(128)]) ** 2
    A = np.stack([np.ones_like(x), x], axis=1)
    cov = np.linalg.inv(A.T @ (A * w[:, None]))
    sol = cov @ (A * w[:, None]).T @ y
    assert fit.rm == pytest.approx(sol[1], rel=1e-9)
    assert fit.rm_err == pytest.approx(math.sqrt(cov[1, 1]), rel=1e-9)


def test_wls_helpers_roundtrip(spark):
    """wls_sufficient_stats + wls_solve on a tiny exact system: y = 3 +
    2x with unit weights → slope exactly 2, intercept exactly 3."""
    df = spark.createDataFrame(
        [("g", float(i), 3.0 + 2.0 * i, 1.0) for i in range(8)],
        ["g", "x", "y", "w"],
    )
    out = wls_solve(
        wls_sufficient_stats(df, ["g"], F.col("x"), F.col("y"), F.col("w"))
    ).collect()[0]
    assert out.slope == pytest.approx(2.0, abs=1e-12)
    assert out.intercept == pytest.approx(3.0, abs=1e-12)
    assert out.wrms == pytest.approx(0.0, abs=1e-9)


def test_position_angle_and_lambda_sq(spark):
    df = spark.createDataFrame([(1.0, 0.0), (0.0, 1.0), (-1.0, 0.0)], ["q", "u"])
    pas = [r[0] for r in df.select(position_angle(F.col("q"), F.col("u"))).collect()]
    assert pas[0] == pytest.approx(0.0)
    assert pas[1] == pytest.approx(math.pi / 4)
    assert abs(pas[2]) == pytest.approx(math.pi / 2)
    lam2 = (
        spark.range(1)
        .select(lambda_sq_m2(F.lit(1400.0)))
        .collect()[0][0]
    )
    assert lam2 == pytest.approx((299792458.0 / 1.4e9) ** 2, rel=1e-12)


def test_dm_fit_plan_one_shuffle_no_udf(spark):
    """The fit is ONE hash aggregation: exactly one Exchange in the
    plan, no BatchEvalPython/ArrowEvalPython (pure JVM expressions)."""
    df = _toas(spark, 0.001, 0.0, 10.0)
    fit = fit_dm(
        df, ["psr"], F.col("f"), F.col("resid_s"), F.col("err_s"),
        F.col("dm0"), F.col("mjd"),
    )
    plan = fit._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1 + plan.count("ReusedExchange")
    assert "EvalPython" not in plan


def test_rm_synthesis_recovers_wrapped_rm(spark, sf_dir):
    """RM synthesis finds |RM| values whose PA swing wraps many times
    across the band — the regime where fit_rm's linear fit is invalid.
    Every injected RM must land on the nearest grid point (step 2)."""
    from meerpipe_spark.queries import QUERIES

    rows = {r.obs: r for r in QUERIES["rm_synthesis_spectrum"].fn(spark, sf_dir).collect()}
    want = {"1-URGENT": 35.0, "2-HIGH": -20.0, "3-MEDIUM": 8.0,
            "4-NOT SPECIFIED": -42.0, "5-LOW": 15.0}
    for obs, rm_t in want.items():
        assert abs(rows[obs].rm_peak - rm_t) <= 2.0, obs
        assert rows[obs].peak_amp > 0.9       # fully polarized source
        assert rows[obs].max_sidelobe < 0.8   # peak clearly dominates


def test_rm_refine_e2e_recovers_beyond_linear_regime(spark, sf_dir):
    """VERDICT r6 #5: the composed coarse+fine flow — synthesis peak on
    the step-2 grid seeding fit_rm's linear refinement — must recover
    each injected NON-grid RM to well under the grid step, at |RM|
    values whose PA swing wraps far outside fit_rm's own validity."""
    from meerpipe_spark.queries import QUERIES

    rows = {r.obs: r for r in QUERIES["rm_refine_e2e"].fn(spark, sf_dir).collect()}
    want = {"1-URGENT": 35.4, "2-HIGH": -19.7, "3-MEDIUM": 8.25,
            "4-NOT SPECIFIED": -41.6, "5-LOW": 14.9}
    for obs, rm_t in want.items():
        r = rows[obs]
        assert abs(r.rm_peak - rm_t) <= 1.0, obs             # coarse stage
        # refined estimate consistent with its own error bar (the test
        # SF has only a few hundred channels; 4σ + grid-rounding slack)
        assert abs(r.rm - rm_t) < max(4 * r.rm_err, 0.01), obs
        assert abs(r.rm - rm_t) < 0.5, obs                   # ≪ grid step
        assert abs(r.pa0 - 0.1) < 0.05, obs                  # PA at λ²=0
