"""Weighted linear least-squares fits as pure DataFrame aggregations.

The reference obtains its DM and RM measurements by shelling out to
external fitters (tempo2 for the per-channel-TOA DM fit whose output is
the ``dm_file`` consumed by
``meerpipe/scripts/generate_images_results.py:281-291`` — fields DM, ERR,
EPOCH, CHI2R, TRES, RM, RM_ERR). Both measurements are weighted linear
regressions:

- **DM**: the cold-plasma dispersion delay is t(f) = K·DM/f² with
  K = 4.148808e3 s·MHz²·pc⁻¹·cm³, so per-channel timing residuals are
  LINEAR in DM: fit r_i = a + b·x_i with x_i = K/f_i², and b is the DM
  correction.
- **RM**: Faraday rotation turns the position angle by θ(λ) = PA₀ + RM·λ²,
  so the per-channel PA (from Stokes Q/U) is LINEAR in λ².

Spark-first: the whole fit is ONE hash aggregation of sufficient
statistics (Σw, Σwx, Σwy, Σwx², Σwxy, Σwy²) — map-side partials, a
single shuffle on the group key, closed-form solve in the projection.
No UDF, no collect; fits millions of (pulsar, obs) groups in one stage
at any scale. The closed forms (shared by the DuckDB oracles
op-for-op):

    D  = S·Sxx − Sx·Sx
    b  = (S·Sxy − Sx·Sy) / D          slope
    a  = (Sxx·Sy − Sx·Sxy) / D        intercept
    χ² = Syy − a·Sy − b·Sxy           (via the normal equations)
    σ_b = sqrt(S / D),  σ_a = sqrt(Sxx / D)
    wrms = sqrt(χ² / S)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Dispersion constant: delay_seconds = DM_K * DM / f_MHz^2
#: (DM in pc cm^-3; the conventional 1/2.41e-4 form used by tempo2/psrchive)
DM_K = 4.148808e3


def wls_sufficient_stats(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    w: Column,
) -> DataFrame:
    """Per-group sufficient statistics of the weighted regression of
    ``y`` on ``x`` with weights ``w`` — one partial-aggregated shuffle."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(w).alias("s"),
        F.sum(w * x).alias("sx"),
        F.sum(w * y).alias("sy"),
        F.sum(w * x * x).alias("sxx"),
        F.sum(w * x * y).alias("sxy"),
        F.sum(w * y * y).alias("syy"),
    )


def wls_solve(stats: DataFrame) -> DataFrame:
    """Closed-form WLS solve over the sufficient-statistic frame:
    adds slope, intercept, slope_err, intercept_err, chi2r, wrms.
    Pure projection (no shuffle); the expression trees match the SQL
    oracles operation for operation."""
    d = F.col("s") * F.col("sxx") - F.col("sx") * F.col("sx")
    b = (F.col("s") * F.col("sxy") - F.col("sx") * F.col("sy")) / d
    a = (F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy")) / d
    chi2 = F.col("syy") - a * F.col("sy") - b * F.col("sxy")
    return stats.select(
        "*",
        b.alias("slope"),
        a.alias("intercept"),
        F.sqrt(F.col("s") / d).alias("slope_err"),
        F.sqrt(F.col("sxx") / d).alias("intercept_err"),
        (chi2 / (F.col("n") - F.lit(2)).cast("double")).alias("chi2r"),
        F.sqrt(chi2 / F.col("s")).alias("wrms"),
    )


def fit_dm(
    toas: DataFrame,
    group_cols: list[str],
    freq_mhz: Column,
    resid_s: Column,
    err_s: Column,
    dm0: Column,
    mjd: Column,
) -> DataFrame:
    """Native DM fit over per-channel TOA residuals (the dm_file
    producer behind generate_images_results.py:281-291, without
    tempo2): one WLS of residual vs K/f² per group.

    ``dm0`` must be CONSTANT within each group — it is the group's
    reference DM from the par file, not a per-TOA quantity. It is
    aggregated with min() so the result stays deterministic even for a
    caller that violates the contract.

    Returns per group: ``dm`` (dm0 + fitted correction), ``dm_err``,
    ``dm_epoch`` (weighted mean TOA MJD), ``dm_chi2r`` (reduced χ² of
    the 2-parameter fit), ``dm_tres`` (post-fit weighted RMS residual,
    µs) — exactly the DM/ERR/EPOCH/CHI2R/TRES fields of the reference's
    results document.
    """
    x = F.lit(DM_K) / (freq_mhz * freq_mhz)
    w = F.lit(1.0) / (err_s * err_s)
    stats = toas.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(w).alias("s"),
        F.sum(w * x).alias("sx"),
        F.sum(w * resid_s).alias("sy"),
        F.sum(w * x * x).alias("sxx"),
        F.sum(w * x * resid_s).alias("sxy"),
        F.sum(w * resid_s * resid_s).alias("syy"),
        F.sum(w * mjd).alias("swt"),
        # dm0 is the group's reference DM and MUST be constant within a
        # group (it comes from the obs's par file); min() makes the
        # aggregation deterministic even if a caller violates that —
        # F.first() would silently pick a partition-order-dependent row
        F.min(dm0).alias("dm0"),
    )
    d = F.col("s") * F.col("sxx") - F.col("sx") * F.col("sx")
    b = (F.col("s") * F.col("sxy") - F.col("sx") * F.col("sy")) / d
    a = (F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy")) / d
    chi2 = F.col("syy") - a * F.col("sy") - b * F.col("sxy")
    return stats.select(
        *group_cols,
        "n",
        (F.col("dm0") + b).alias("dm"),
        F.sqrt(F.col("s") / d).alias("dm_err"),
        (F.col("swt") / F.col("s")).alias("dm_epoch"),
        (chi2 / (F.col("n") - F.lit(2)).cast("double")).alias("dm_chi2r"),
        (F.sqrt(chi2 / F.col("s")) * F.lit(1e6)).alias("dm_tres"),
    )


def position_angle(q: Column, u: Column) -> Column:
    """Linear-polarisation position angle PA = ½·atan2(U, Q) from the
    Stokes pair (psrchive convention, radians in (−π/2, π/2])."""
    return F.lit(0.5) * F.atan2(u, q)


def lambda_sq_m2(freq_mhz: Column) -> Column:
    """λ² in m² from the channel centre frequency in MHz."""
    c = 299792458.0
    lam = F.lit(c) / (freq_mhz * F.lit(1e6))
    return lam * lam


def fit_rm(
    chans: DataFrame,
    group_cols: list[str],
    freq_mhz: Column,
    q: Column,
    u: Column,
    pa_err: Column,
) -> DataFrame:
    """Native RM fit: weighted linear regression of the per-channel
    position angle PA = ½·atan2(U, Q) on λ² across the band (the
    RM/RM_ERR fields of the results document). Valid when the total PA
    swing across the band stays within ±π/2 (no wrap ambiguity) — the
    regime after coarse RM correction, which is where the reference's
    refinement fit runs.

    Returns per group: ``rm`` (rad m⁻²), ``rm_err``, ``pa0`` (PA at
    λ²=0), ``rm_chi2r``.
    """
    x = lambda_sq_m2(freq_mhz)
    y = position_angle(q, u)
    w = F.lit(1.0) / (pa_err * pa_err)
    solved = wls_solve(wls_sufficient_stats(chans, group_cols, x, y, w))
    return solved.select(
        *group_cols,
        "n",
        F.col("slope").alias("rm"),
        F.col("slope_err").alias("rm_err"),
        F.col("intercept").alias("pa0"),
        F.col("chi2r").alias("rm_chi2r"),
    )


def huber_line_fit(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    delta: float,
    iters: int = 3,
) -> DataFrame:
    """Robust line fit y ~ a + b*x by Huber IRLS (Huber 1964): fixed
    ``iters`` unrolled iterations, the first ordinary least squares
    (w = 1), each subsequent one reweighting with the Huber psi
    w = min(1, delta/|r|) against the previous coefficients — outliers
    beyond ``delta`` get down-weighted proportionally instead of
    dominating the quadratic loss.

    The ``logistic_irls`` discipline one model-family over: per
    iteration ONE sufficient-statistic hash aggregation (5 weighted
    sums + count per group, map-side partials — constant bytes per
    group per shuffle at any corpus size) and a closed-form 2x2 solve
    in the projection; coefficient frames chain through broadcast
    joins, never the driver. The weight guard is branch-exact
    (CASE WHEN |r| <= delta THEN 1 ELSE delta/|r|), so ANSI mode never
    sees a zero divisor and the oracle shares the expression tree
    op-for-op.

    Returns per group: n, slope_ols/intercept_ols (iteration 1) and
    slope/intercept (final), plus n_downweighted and mean_w diagnosed
    against the FINAL coefficients.
    """
    gb = list(group_cols)
    pts = df.select(*gb, x.alias("x"), y.alias("y"))
    from meerpipe_spark.cacheutil import persist_tracked

    pts = persist_tracked(pts)  # consumed once per iteration + diagnostics

    def solve(stats: DataFrame) -> DataFrame:
        d = F.col("s") * F.col("sxx") - F.col("sx") * F.col("sx")
        b = (F.col("s") * F.col("sxy") - F.col("sx") * F.col("sy")) / d
        a = (F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy")) / d
        return stats.select(*gb, "n", b.alias("b"), a.alias("a"))

    def sums(z: DataFrame) -> DataFrame:
        return z.groupBy(*gb).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("w").alias("s"),
            F.sum(F.col("w") * F.col("x")).alias("sx"),
            F.sum(F.col("w") * F.col("y")).alias("sy"),
            F.sum(F.col("w") * F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("w") * F.col("x") * F.col("y")).alias("sxy"),
        )

    # materialize each group-sized coefficient frame (r13): the output
    # tail references ols, the final beta AND the diagnostics, and Spark
    # does not dedupe shared subtrees — un-truncated, the ols leg re-ran
    # pass 1 and the diag leg re-ran the whole IRLS nest, 8 passes over
    # pts instead of iters+1; each checkpoint reads/writes ≤ group-count
    # rows and leaves the per-pass float sequence untouched
    beta = solve(
        sums(pts.select(*gb, "x", "y", F.lit(1.0).alias("w")))
    ).localCheckpoint(eager=True)
    ols = beta
    r_abs = F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x")))
    w_col = F.when(r_abs <= F.lit(delta), F.lit(1.0)).otherwise(
        F.lit(delta) / r_abs
    )
    for _ in range(iters - 1):
        joined = pts.join(F.broadcast(beta), gb)
        beta = solve(
            sums(joined.select(*gb, "x", "y", w_col.alias("w")))
        ).localCheckpoint(eager=True)
    diag = (
        pts.join(F.broadcast(beta), gb)
        .select(*gb, w_col.alias("w"))
        .groupBy(*gb)
        .agg(
            F.sum(F.when(F.col("w") < 1.0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_downweighted"),
            F.avg("w").alias("mean_w"),
        )
    )
    return (
        ols.select(*gb, F.col("b").alias("b_ols"), F.col("a").alias("a_ols"))
        .join(beta, gb)
        .join(diag, gb)
    )


def kfold_ols_cv(
    df: DataFrame,
    fold: Column,
    x: Column,
    y: Column,
) -> DataFrame:
    """k-fold cross-validated OLS in ONE pass over the data: per-fold
    sufficient statistics (n, Σx, Σy, Σx², Σxy, Σy²) plus the same
    sums over the whole table; fold f's TRAINING sums are then just
    total − fold (sufficient statistics are additive), the coefficient
    solve is closed-form, and fold f's VALIDATION SSE expands from its
    own sums:

        SSE_f = Σyy − 2a·Σy − 2b·Σxy + 2ab·Σx + a²·n + b²·Σxx

    so k models AND their held-out errors cost exactly two aggregation
    jobs over the corpus (fold-grouped + total) and a k-row solve — no
    per-fold re-scan, no driver loop over folds. The leave-one-out
    trick every distributed CV harness should use.

    Returns per fold: n_train, b, a, val_rmse (unrounded — callers
    round per the house conventions).
    """
    pts = df.select(fold.alias("fold"), x.alias("x"), y.alias("y"))
    from meerpipe_spark.cacheutil import persist_tracked

    pts = persist_tracked(pts)  # two aggregation consumers
    aggs = [
        F.count(F.lit(1)).cast("double").alias("s"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ]
    fs = pts.groupBy("fold").agg(*aggs)
    tot = pts.agg(
        F.count(F.lit(1)).cast("double").alias("ts"),
        F.sum("x").alias("tsx"),
        F.sum("y").alias("tsy"),
        F.sum(F.col("x") * F.col("x")).alias("tsxx"),
        F.sum(F.col("x") * F.col("y")).alias("tsxy"),
        F.sum(F.col("y") * F.col("y")).alias("tsyy"),
    )
    j = fs.crossJoin(F.broadcast(tot))
    s = F.col("ts") - F.col("s")
    sx = F.col("tsx") - F.col("sx")
    sy = F.col("tsy") - F.col("sy")
    sxx = F.col("tsxx") - F.col("sxx")
    sxy = F.col("tsxy") - F.col("sxy")
    d = s * sxx - sx * sx
    b = (s * sxy - sx * sy) / d
    a = (sxx * sy - sx * sxy) / d
    solved = j.select(
        "fold",
        s.cast("bigint").alias("n_train"),
        b.alias("b"),
        a.alias("a"),
        "s", "sx", "sy", "sxx", "sxy", "syy",
    )
    sse = (
        F.col("syy")
        - 2.0 * F.col("a") * F.col("sy")
        - 2.0 * F.col("b") * F.col("sxy")
        + 2.0 * F.col("a") * F.col("b") * F.col("sx")
        + F.col("a") * F.col("a") * F.col("s")
        + F.col("b") * F.col("b") * F.col("sxx")
    )
    return solved.select(
        "fold",
        "n_train",
        "b",
        "a",
        F.sqrt(sse / F.col("s")).alias("val_rmse"),
    )
