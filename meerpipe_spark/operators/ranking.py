"""Pairwise-preference ranking: Bradley-Terry scores by MM iteration.

The preference-data primitive behind reward-model training sets and
item leaderboards: given duels (winner, loser) — human preference
labels, A/B outcomes, chess games — estimate a latent skill `s_i > 0`
per item under the Bradley-Terry model `P(i beats j) = s_i/(s_i+s_j)`
with the classic minorize-maximize update (Hunter 2004, public
algorithm):

    s_i  <-  (W_i + a) / ( sum_j n_ij/(s_i+s_j)  +  2a/(s_i+1) )

where `W_i` is item i's win count, `n_ij` the number of duels between
i and j, and `a` a pseudo-count anchoring every item against a virtual
skill-1.0 opponent (a virtual 2a games, half won). The anchor makes the
likelihood strictly concave — zero-win items get a finite score and a
disconnected comparison graph cannot diverge — and pins the scale, on
top of which each round mean-normalizes to keep scores O(1).

Scale design (the fit-the-model-in-aggregates shape, like
operators/logreg.py):

- the ONLY fact-sized work is building `wins` and the symmetric pair
  table `n_ij` — one groupBy each over the duel stream;
- every MM round then runs on the pair table (distinct item pairs, not
  duels): two equi-joins against the item-sized score frame, one
  map-side-combined sum per item, one scalar normalizer. With k items
  the round shuffles O(#pairs) ≤ O(k²) rows regardless of how many
  billion duels produced the counts;
- scores chain through joins — they never visit the driver, and no
  step is a crossJoin except against the 1-row normalizer (broadcast).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

# Checkpointed leaves carry no size statistics (UnknownPartitioning +
# Long.Max sizeInBytes), so the planner can never auto-broadcast the
# model-sized frames and every MM-round join degenerates to a sort-merge
# shuffle of BOTH sides.  We know the real cardinality (k items after the
# duel collapse), so hint BROADCAST when it fits; above the ceiling the
# plan is byte-identical to before (shuffle join at scale).  Same design
# as operators/graph.py::_bcast_small.
_BCAST_MAX_ROWS = int(os.environ.get("SPARK_GRAFT_RANK_BCAST_MAX_ROWS", "4000000"))


def _bcast_small(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast-hint ``df`` under the ranking ceiling (shared
    threshold logic: cacheutil.bcast_small)."""
    from meerpipe_spark.cacheutil import bcast_small

    return bcast_small(df, n_rows, _BCAST_MAX_ROWS)


def duel_counts(duels: DataFrame, winner: str = "winner", loser: str = "loser"):
    """Collapse a duel stream to model-sized sufficient statistics.

    Returns (items, wins, pairs):
      items — one row per item appearing in any duel: (item);
      wins  — (item, wins) with zero-win items present;
      pairs — symmetric (i, j, n_ij): both directions, n_ij = total
              duels between the pair in either orientation.

    The directed-count aggregation is the ONLY fact-sized work; it is
    eagerly checkpointed (≤ k² rows) so the duel scan executes exactly
    once and every downstream frame — and every MM round — is a small
    plan over that leaf. Duels with winner == loser are rejected
    upstream by construction (callers must not emit self-duels; they
    would cancel in the MM update but inflate n_ii).
    """
    items, wins, pairs, _ = _duel_counts_bounded(duels, winner, loser)
    return items, wins, pairs


def _duel_counts_bounded(duels: DataFrame, winner: str, loser: str):
    """duel_counts plus the known model-size bound (the symmetric pair
    count, >= every downstream frame's row count) for the broadcast
    decision.  ``pairs`` is eagerly checkpointed like ``directed`` —
    same cardinality class (<= 2x the directed counts) — because every
    MM round otherwise re-runs the symmetric merge aggregation."""
    w = F.col(winner)
    l = F.col(loser)
    directed = (
        duels.groupBy(w.alias("i"), l.alias("j"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    pairs = (
        directed.select("i", "j", "n")
        .unionAll(directed.select(F.col("j").alias("i"), F.col("i").alias("j"), "n"))
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n_ij"))
        .localCheckpoint(eager=True)
    )
    n_bound = pairs.count()  # materialized leaf: partition-size sum, no recompute
    items = pairs.select(F.col("i").alias("item")).distinct()
    wins = items.join(
        _bcast_small(
            directed.groupBy(F.col("i").alias("item")).agg(F.sum("n").alias("wins")),
            n_bound,
        ),
        "item",
        "left",
    ).select("item", F.coalesce(F.col("wins"), F.lit(0)).cast("bigint").alias("wins"))
    return items, wins, pairs, n_bound


def bradley_terry(
    duels: DataFrame,
    winner: str = "winner",
    loser: str = "loser",
    iters: int = 6,
    anchor: float = 1.0,
) -> DataFrame:
    """Fit Bradley-Terry skills from a (winner, loser) duel stream.

    Returns (item, wins, n_duels, score): `score` is the anchored,
    mean-normalized MM estimate after `iters` rounds from the flat
    s=1 start. Deterministic given the duel multiset — every update is
    a closed-form expression over exact integer counts, so a DuckDB
    twin unrolling the same rounds reproduces it to float round-off.
    """
    items, wins, pairs, n_bound = _duel_counts_bounded(duels, winner, loser)
    stats = wins.join(
        _bcast_small(
            pairs.groupBy(F.col("i").alias("item")).agg(
                F.sum("n_ij").cast("bigint").alias("n_duels")
            ),
            n_bound,
        ),
        "item",
    )
    # model-sized from here on (≤ k² pair rows, k item rows), all small
    # plans over the checkpointed directed-count leaf; `scores` is
    # lazily checkpointed every round because each MM round references
    # it twice — an unbroken lineage would double the LOGICAL plan per
    # round (2^iters copies by round 6; the shared-object RDD DAG
    # behind the checkpoint stays linear)
    scores = stats.select("item", F.lit(1.0).alias("s"))
    a = float(anchor)
    for _ in range(iters):
        den = (
            pairs.join(
                _bcast_small(
                    scores.select(F.col("item").alias("i"), F.col("s").alias("s_i")),
                    n_bound,
                ),
                "i",
            )
            .join(
                _bcast_small(
                    scores.select(F.col("item").alias("j"), F.col("s").alias("s_j")),
                    n_bound,
                ),
                "j",
            )
            .groupBy(F.col("i").alias("item"))
            .agg(
                F.sum(F.col("n_ij") / (F.col("s_i") + F.col("s_j"))).alias("den"),
                F.min("s_i").alias("s_cur"),
            )
        )
        raw = (
            stats.join(_bcast_small(den, n_bound), "item")
            .select(
                "item",
                (
                    (F.col("wins") + F.lit(a))
                    / (F.col("den") + F.lit(2.0 * a) / (F.col("s_cur") + F.lit(1.0)))
                ).alias("s_raw"),
            )
        )
        norm = raw.agg(
            (F.count(F.lit(1)).cast("double") / F.sum("s_raw")).alias("k")
        )
        scores = (
            raw.crossJoin(F.broadcast(norm))
            .select("item", (F.col("s_raw") * F.col("k")).alias("s"))
            .localCheckpoint(eager=False)
        )
    return stats.join(_bcast_small(scores, n_bound), "item").select(
        "item", "wins", "n_duels", F.col("s").alias("score")
    )
