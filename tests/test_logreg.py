"""Native IRLS logistic regression (operators/logreg.py) — the
quality-classifier trainer. Recovery is checked against data generated
from a KNOWN logistic model, the grouped path against per-group truth,
and the registered query's end-to-end behavior (signs + accuracy)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.logreg import logistic_evaluate, logistic_irls


def _synth(rng, n, beta, group="g0"):
    """Rows from a true logistic model: x ~ U, y ~ Bernoulli(sigma(b.x))."""
    rows = []
    for _ in range(n):
        x = rng.uniform(-2, 2, size=3)
        t = beta[0] + float(np.dot(beta[1:], x))
        p = 1.0 / (1.0 + math.exp(-t))
        rows.append(
            Row(g=group, x1=float(x[0]), x2=float(x[1]), x3=float(x[2]),
                y=int(rng.uniform() < p))
        )
    return rows


def FX():
    return [F.col("x1"), F.col("x2"), F.col("x3")]


def test_irls_recovers_true_coefficients(spark):
    rng = np.random.default_rng(7)
    beta = [0.5, 1.5, -2.0, 0.8]
    df = spark.createDataFrame(_synth(rng, 4000, beta))
    fit = logistic_irls(df, FX(), F.col("y"), iters=4).collect()[0]
    got = [fit.b0, fit.b1, fit.b2, fit.b3]
    # 4000 Bernoulli draws: each coefficient within ~3 standard errors
    for g, b in zip(got, beta):
        assert abs(g - b) < 0.35, (got, beta)
    assert fit.n == 4000


def test_irls_grouped_fits_are_independent(spark):
    rng = np.random.default_rng(11)
    rows = _synth(rng, 2500, [0.0, 2.0, 0.0, 0.0], "steep") + _synth(
        rng, 2500, [0.0, -2.0, 0.0, 0.0], "anti"
    )
    fits = {
        r.g: r
        for r in logistic_irls(
            spark.createDataFrame(rows), FX(), F.col("y"), iters=4, group_cols=["g"]
        ).collect()
    }
    assert abs(fits["steep"].b1 - 2.0) < 0.4
    assert abs(fits["anti"].b1 + 2.0) < 0.4


def test_evaluate_accuracy_beats_majority_class(spark):
    rng = np.random.default_rng(3)
    df = spark.createDataFrame(_synth(rng, 3000, [0.0, 2.5, -2.5, 1.0]))
    model = logistic_irls(df, FX(), F.col("y"), iters=4)
    m = logistic_evaluate(df, FX(), F.col("y"), model).collect()[0]
    base = df.agg(F.avg("y")).collect()[0][0]
    assert m.accuracy > max(base, 1 - base) + 0.1
    assert 0 < m.logloss < math.log(2)  # better than the coin-flip bound


def test_irls_rejects_wrong_feature_count(spark):
    with pytest.raises(ValueError):
        logistic_irls(spark.range(1), [F.col("id")], F.lit(1))


def test_quality_logreg_query_signs_and_accuracy(spark, sf_dir):
    """The registered lane must recover the generating hyperplane's
    signs (+log-length, -token-length, +stopword-ratio) and beat the
    noise floor the +/-1.5 uniform label noise imposes."""
    from meerpipe_spark.queries import QUERIES

    r = QUERIES["quality_logreg_train"].fn(spark, sf_dir).collect()[0]
    assert r.b1 > 0 and r.b2 < 0 and r.b3 > 0, r
    assert r.accuracy > 0.7, r
    assert r.logloss < math.log(2), r


def test_irls_degenerate_single_class_stays_finite(spark):
    """Perfect separation limit: with every label 1 the MLE diverges
    (b0 → ∞), but FOUR bounded Newton steps must return finite
    coefficients (b0 grows ~1 per step past ~4, slopes ~0) — never
    NaN/Inf from the w → 0 working weights."""
    import math

    df = spark.range(200).select(
        (F.col("id") % 7).cast("double").alias("x1"),
        (F.col("id") % 3).cast("double").alias("x2"),
        (F.col("id") % 5).cast("double").alias("x3"),
        F.lit(1).alias("y"),
    )
    r = logistic_irls(df, FX(), F.col("y"), iters=4).collect()[0]
    for v in (r.b0, r.b1, r.b2, r.b3):
        assert math.isfinite(v), r
    assert r.b0 > 3  # pushes toward +inf, as the separated MLE should
    assert abs(r.b1) < 1e-6 and abs(r.b2) < 1e-6 and abs(r.b3) < 1e-6
