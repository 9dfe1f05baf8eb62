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

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_D = "double"

#: r13 (guide §3.1): the half-round joins ratings ⋈ factors hang off
#: lazily-checkpointed leaves that carry NO size statistics, so the
#: planner ran every one as a SortMergeJoin — a full exchange of the
#: FACT table per half-round (6 per fit + 2 more in the RMSE pass).
#: The factor frames are entity-sized (5–10 doubles per distinct user
#: or item) and their cardinality is fixed across rounds, so one count
#: per entity class gives the planner the decision AQE would make with
#: statistics: BROADCAST the factor side while it fits the ceiling,
#: byte-identical shuffle plan above it (100 TB-scale entity sets keep
#: the relational plan). Same pattern and envelope as graph.py /
#: ranking.py; override per deployment via SPARK_GRAFT_ALS_BCAST_MAX_ROWS.
_BCAST_FACTOR_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_ALS_BCAST_MAX_ROWS", "4000000")
)


def _bcast_small(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast-hint ``df`` under the factor ceiling (shared
    threshold logic: cacheutil.bcast_small). Cost-only: the per-entity
    solves are pure functions of per-entity sufficient statistics, so
    join strategy cannot change values (re-verified against the
    unrolled DuckDB oracle at sf0.01/sf0.1)."""
    from meerpipe_spark.cacheutil import bcast_small

    return bcast_small(df, n_rows, _BCAST_FACTOR_MAX_ROWS)


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
    # entity cardinalities are FIXED across rounds (every rated item /
    # user re-appears each half-round), so one count per class feeds
    # every round's broadcast decision; the count materializes the
    # checkpoint the next join needs anyway
    n_i = itemf.count()
    n_u = None
    userf = None
    for _ in range(iters):
        ua = (
            rat.join(_bcast_small(itemf, n_i), "i")
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
        if n_u is None:
            n_u = userf.count()
        ia = (
            rat.join(_bcast_small(userf, n_u), "u")
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
    # return the frames pre-hinted: every downstream consumer join
    # (RMSE pass, segment rollup) makes the same entity-sized-vs-fact
    # decision without re-counting; strict no-op above the ceiling
    return _bcast_small(userf, n_u), _bcast_small(itemf, n_i)


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


# ---------------------------------------------------------------------------
# Parameterized rank-k path (VERDICT r10 item 7). The rank-2 operator
# above stays the pinned, DuckDB-oracle-checkable twin; this one trades
# the closed-form Cramer solve for a batched LAPACK solve inside ONE
# Arrow-vectorized pandas UDF over ENTITY-sized frames — the UDF input
# is k(k+1)/2 + k doubles per entity (sufficient statistics), never a
# rating row, so the Python boundary costs O(entities·k²) regardless of
# corpus size. Everything fact-sized stays JVM-side.
# ---------------------------------------------------------------------------

# moduli/sign schedule for deterministic factor init; f=0,1 reproduce
# als_rank2's (q1, q2) exactly so the k=2 path is bit-comparable.
_INIT_MOD = (7, 5, 11, 13, 3, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59)


def _init_expr(key: F.Column, f: int) -> F.Column:
    sign = 1.0 if f % 2 == 0 else -1.0
    m = _INIT_MOD[f % len(_INIT_MOD)]
    return F.lit(1.0) + F.lit(sign * 0.1) * (key % m).cast(_D)


def _solve_k_udf(k: int, reg: float):
    """Batched (A + λI)x = b solver: input is the packed upper triangle
    of A (row-major, k(k+1)/2) concatenated with b (k); output x (k).
    numpy.linalg.solve over a (n, k, k) stack — one LAPACK call per
    Arrow batch, deterministic per entity (solve is per-matrix; batch
    composition cannot change a row's result)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    iu = np.triu_indices(k)
    nu = len(iu[0])

    @pandas_udf(ArrayType(DoubleType()))
    def solve(stats: pd.Series) -> pd.Series:
        m = np.asarray(stats.tolist(), dtype=np.float64)
        a = np.zeros((m.shape[0], k, k))
        a[:, iu[0], iu[1]] = m[:, :nu]
        a[:, iu[1], iu[0]] = m[:, :nu]
        a[:, range(k), range(k)] += reg
        x = np.linalg.solve(a, m[:, nu:])
        return pd.Series(x.tolist())

    return solve


def _half_step_k(
    rat: DataFrame, factors: DataFrame, join_key: str, out_key: str,
    k: int, solve, n_factors: int | None = None,
) -> DataFrame:
    """One ALS half-round at rank k: fact-sized equi-join, map-side-
    combined aggregation to k(k+1)/2 + k doubles per entity, then the
    entity-sized batched solve. ``n_factors`` (the factor frame's known
    row count) lets the join broadcast the entity-sized side instead of
    shuffling the fact table (r13, guide §3.1)."""
    j = rat.join(_bcast_small(factors, n_factors), join_key)
    aggs = [
        F.sum(F.col("q")[a] * F.col("q")[b]).alias(f"s_{a}_{b}")
        for a in range(k)
        for b in range(a, k)
    ] + [F.sum(F.col("r") * F.col("q")[f]).alias(f"b_{f}") for f in range(k)]
    stats = j.groupBy(out_key).agg(*aggs)
    packed = F.array(
        *[F.col(f"s_{a}_{b}") for a in range(k) for b in range(a, k)],
        *[F.col(f"b_{f}") for f in range(k)],
    )
    return stats.select(
        out_key, solve(packed).alias("q")
    ).localCheckpoint(eager=False)


def als_rank_k(
    ratings: DataFrame,
    k: int,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "r",
    iters: int = 3,
    reg: float = 0.5,
):
    """Rank-k ALS (Zhou et al. 2008 ALS-WR): same sufficient-statistic
    half-rounds as als_rank2, per-entity k×k normal equations solved by
    one Arrow-batched LAPACK call over entity-sized frames. Returns
    (user_factors, item_factors) as (u, p: array<double>[k]) and
    (i, q: array<double>[k]).

    Init mirrors als_rank2 for f<2 (so k=2 is directly comparable) and
    extends with a prime-modulus/alternating-sign schedule — columns
    stay linearly independent, so A is nonsingular even before λI.
    """
    if k < 1:
        raise ValueError(f"als_rank_k requires k >= 1, got {k}")
    if iters < 1:
        raise ValueError(f"als_rank_k requires iters >= 1, got {iters}")
    if reg <= 0:
        # (A + λI) is guaranteed positive definite only for λ > 0; with
        # reg=0 a per-entity singular Gram matrix (entity with < k
        # distinct co-rated factors) would raise LinAlgError inside the
        # Arrow batch and kill the whole stage. Fail at the API edge
        # instead, matching the k/iters guards. (ADVICE r11)
        raise ValueError(f"als_rank_k requires reg > 0, got {reg}")
    rat = ratings.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(rating_col).cast(_D).alias("r"),
    ).localCheckpoint(eager=False)
    solve = _solve_k_udf(k, reg)
    itemf = rat.select("i").distinct().select(
        "i", F.array(*[_init_expr(F.col("i"), f) for f in range(k)]).alias("q")
    ).localCheckpoint(eager=False)
    n_i = itemf.count()
    n_u = None
    userf = None
    for _ in range(iters):
        userf = _half_step_k(rat, itemf, "i", "u", k, solve, n_i)
        if n_u is None:
            n_u = userf.count()
        itemf = _half_step_k(rat, userf, "u", "i", k, solve, n_u)
    return (
        _bcast_small(userf.withColumnRenamed("q", "p"), n_u),
        _bcast_small(itemf, n_i),
    )


def als_rmse_k(
    ratings: DataFrame,
    user_factors: DataFrame,
    item_factors: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "r",
    reg: float = 0.0,
) -> DataFrame:
    """RMSE (+ the regularized ALS objective when ``reg`` is passed —
    the quantity each half-round provably non-increases) for array-
    factor frames: fact-sized joins, zip_with dot products, one global
    aggregate."""
    j = (
        ratings.select(
            F.col(user_col).alias("u"),
            F.col(item_col).alias("i"),
            F.col(rating_col).cast(_D).alias("r"),
        )
        .join(user_factors, "u")
        .join(item_factors, "i")
    )
    dot = F.aggregate(
        F.zip_with("p", "q", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    err = F.col("r") - dot
    sq = F.sum(err * err)
    sumsq = lambda c: F.aggregate(c, F.lit(0.0), lambda s, x: s + x * x)  # noqa: E731
    pen_u = user_factors.select(sumsq("p").alias("w")).agg(F.sum("w").alias("wu"))
    pen_i = item_factors.select(sumsq("q").alias("w")).agg(F.sum("w").alias("wi"))
    base = j.agg(
        F.sqrt(sq / F.count(F.lit(1)).cast(_D)).alias("rmse"),
        sq.alias("sse"),
        F.count(F.lit(1)).cast("bigint").alias("n_ratings"),
    )
    return (
        base.crossJoin(F.broadcast(pen_u))
        .crossJoin(F.broadcast(pen_i))
        .select(
            "rmse",
            "n_ratings",
            (F.col("sse") + F.lit(reg) * (F.col("wu") + F.col("wi"))).alias(
                "objective"
            ),
        )
    )
