"""Alternating least squares matrix factorization, rank 2, relational.

The collaborative-filtering / embedding-pretraining primitive
(Koren, Bell & Volinsky 2009; Zhou et al. 2008 ALS-WR — public
algorithms): factor a (user, item, rating) interaction table into
rank-2 user and item factors by alternating ridge regressions. With
rank fixed at 2 every per-entity solve is CLOSED FORM — a 2×2 Cramer
inverse — so the whole fit is expressible as joins + aggregations and
therefore DuckDB-oracle-checkable, unlike an MLlib black box.

Per half-round (user step; item step is symmetric):

    A_u = Σ_i q_i q_iᵀ + λI        (3 distinct doubles: a11, a12, a22)
    b_u = Σ_i r_ui q_i             (2 doubles)
    p_u = A_u⁻¹ b_u                (Cramer: two divisions by det)

Scale shape — exactly how production ALS runs on a thousand executors:

- each half-round is ONE fact-sized equi-join (ratings ⋈ current
  factors on the entity key) followed by ONE map-side-combined
  aggregation to entity-sized sufficient statistics (5 doubles per
  entity regardless of rating count), then a projection solve;
- factor frames are entity-sized and checkpointed every half-round
  (MLlib persists factor RDDs for the same reason): the alternation
  references each frame twice, so unbroken lineage would double the
  logical plan per half-round;
- nothing ever reaches the driver; λI regularization keeps every det
  strictly positive, so the solve is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_D = "double"


def _solve2(a11, a12, a22, b1, b2, reg: float):
    """Cramer solve of (A + λI) x = b for 2×2 symmetric A — the exact
    float-op order is mirrored in the DuckDB oracle."""
    r = F.lit(reg)
    d11 = a11 + r
    d22 = a22 + r
    det = d11 * d22 - a12 * a12
    x1 = (b1 * d22 - b2 * a12) / det
    x2 = (d11 * b2 - a12 * b1) / det
    return x1, x2


def als_rank2(
    ratings: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "r",
    iters: int = 3,
    reg: float = 0.5,
):
    """Fit rank-2 ALS factors over (user, item, rating).

    Items are initialized from a deterministic integer formula
    (q1 = 1 + (i%7)/10, q2 = 1 − (i%5)/10 — non-degenerate, engine-
    reproducible); `iters` alternations of user-step then item-step
    follow. Returns (user_factors, item_factors) DataFrames:
    (u, p1, p2) and (i, q1, q2). Entity keys must be integers.
    """
    if iters < 1:
        # iters=0 would return userf=None (no user half-step has run)
        # and downstream als_rmse would die on a confusing
        # AttributeError (ADVICE r10) — fail loudly at the API edge.
        raise ValueError(f"als_rank2 requires iters >= 1, got {iters}")
    rat = ratings.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(rating_col).cast(_D).alias("r"),
    ).localCheckpoint(eager=False)
    itemf = rat.select("i").distinct().select(
        "i",
        (F.lit(1.0) + (F.col("i") % 7).cast(_D) * F.lit(0.1)).alias("q1"),
        (F.lit(1.0) - (F.col("i") % 5).cast(_D) * F.lit(0.1)).alias("q2"),
    ).localCheckpoint(eager=False)
    userf = None
    for _ in range(iters):
        ua = (
            rat.join(itemf, "i")
            .groupBy("u")
            .agg(
                F.sum(F.col("q1") * F.col("q1")).alias("a11"),
                F.sum(F.col("q1") * F.col("q2")).alias("a12"),
                F.sum(F.col("q2") * F.col("q2")).alias("a22"),
                F.sum(F.col("r") * F.col("q1")).alias("b1"),
                F.sum(F.col("r") * F.col("q2")).alias("b2"),
            )
        )
        p1, p2 = _solve2(
            F.col("a11"), F.col("a12"), F.col("a22"), F.col("b1"), F.col("b2"), reg
        )
        userf = ua.select("u", p1.alias("p1"), p2.alias("p2")).localCheckpoint(
            eager=False
        )
        ia = (
            rat.join(userf, "u")
            .groupBy("i")
            .agg(
                F.sum(F.col("p1") * F.col("p1")).alias("a11"),
                F.sum(F.col("p1") * F.col("p2")).alias("a12"),
                F.sum(F.col("p2") * F.col("p2")).alias("a22"),
                F.sum(F.col("r") * F.col("p1")).alias("b1"),
                F.sum(F.col("r") * F.col("p2")).alias("b2"),
            )
        )
        q1, q2 = _solve2(
            F.col("a11"), F.col("a12"), F.col("a22"), F.col("b1"), F.col("b2"), reg
        )
        itemf = ia.select("i", q1.alias("q1"), q2.alias("q2")).localCheckpoint(
            eager=False
        )
    return userf, itemf


def als_rmse(
    ratings: DataFrame,
    user_factors: DataFrame,
    item_factors: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "r",
) -> DataFrame:
    """Training RMSE of the factorization: one fact-sized join against
    each entity-sized factor frame, one global aggregate."""
    j = (
        ratings.select(
            F.col(user_col).alias("u"),
            F.col(item_col).alias("i"),
            F.col(rating_col).cast(_D).alias("r"),
        )
        .join(user_factors, "u")
        .join(item_factors, "i")
    )
    err = F.col("r") - (F.col("p1") * F.col("q1") + F.col("p2") * F.col("q2"))
    return j.agg(
        F.sqrt(F.sum(err * err) / F.count(F.lit(1)).cast(_D)).alias("rmse"),
        F.count(F.lit(1)).cast("bigint").alias("n_ratings"),
    )
