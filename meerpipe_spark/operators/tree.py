"""Exact greedy decision-tree training by binned split enumeration.

The quality-gate trainer that complements operators/logreg.py: a CART
depth-d tree (Breiman et al. 1984, public algorithm) fitted RELATIONALLY
— no MLlib, no UDF, no collect:

- every feature is discretized onto a B-bin equi-width grid between its
  global min/max (one aggregation; the grid bounds ride a broadcast
  1-row crossJoin, the classic distributed-histogram trick every
  large-scale tree learner uses — splits are exact w.r.t. the grid);
- one level = ONE fact-sized aggregation to (node, feature, bin) cells
  (≤ nodes·F·B rows, independent of row count), a cumulative window
  over bins turning cell counts into left/right class totals for every
  candidate boundary, and an integer-exact weighted-Gini argmin per
  node (row_number with (score, feature, bin) tiebreak);
- rows re-route to child node ids (node*2 + side) through a broadcast
  join against the per-level split table — node assignment never
  leaves the row's partition.

All split statistics are integer counts; the Gini scores are divisions
of exact integers, so a DuckDB twin evaluating the same expressions
reproduces every argmin BIT-EXACTLY — the whole fitted tree is
oracle-hashable, not just its predictions. A node splits only if the
best candidate strictly reduces weighted impurity (pure nodes and
degenerate grids become leaves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_D = "double"


def _gini_pair(n, pos):
    """n·gini(node) = n - (pos² + neg²)/n, from exact bigint counts.

    The squares are taken in decimal(38,0) (ADVICE r10: bigint pos²
    overflows once a node side exceeds ~3.0e9 same-class rows — ANSI
    mode would THROW mid-fit). decimal(38,0) keeps the sum exact
    because pos+neg = n is itself a bigint: pos²+neg² ≤ n² <
    (2^63)² ≈ 8.5e37 < 10^38−1 (the individual-term bound 2·(2^63)²
    ≈ 1.7e38 would NOT fit — the invariant that saves us is the sum
    constraint, not the per-term one), and the cast-to-double rounds
    the same exact integer the oracle's HUGEINT arithmetic produces,
    so argmins stay bit-exact cross-engine."""
    neg = n - pos
    dec = "decimal(38,0)"
    sq = pos.cast(dec) * pos.cast(dec) + neg.cast(dec) * neg.cast(dec)
    return n.cast(_D) - sq.cast(_D) / n.cast(_D)


def binned_split_tree(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    depth: int = 2,
    bins: int = 24,
) -> DataFrame:
    """Fit a depth-`depth` binary classification tree.

    Returns one row per tree node:
      (node, kind, feature, bin, thr, n, pos, pred)
    kind='split' rows carry the chosen (feature index, bin boundary,
    real-valued threshold, node totals); kind='leaf' rows carry the
    node totals and the majority-class prediction (tie → 0).
    """
    from meerpipe_spark.cacheutil import persist_tracked

    nf = len(feature_cols)
    mm = feats.agg(
        *[
            a
            for i, c in enumerate(feature_cols)
            for a in (
                F.min(F.col(c).cast(_D)).alias(f"mn_{i}"),
                F.max(F.col(c).cast(_D)).alias(f"mx_{i}"),
            )
        ]
    )
    mm = persist_tracked(mm)
    # a CONSTANT feature would make the grid span zero and the bin
    # division raise under ANSI; the guard pins its span to 1 so every
    # row lands in bin 0 — the feature then never yields a valid split
    # (no right side), which is the correct degenerate behavior. The
    # oracle mirrors the same CASE (value-neutral for real features).
    def _span(i: int) -> F.Column:
        mn, mx = F.col(f"mn_{i}"), F.col(f"mx_{i}")
        return F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))

    binned_cols = [
        F.least(
            F.lit(bins - 1),
            F.floor(
                ((F.col(c).cast(_D) - F.col(f"mn_{i}")) / _span(i))
                * F.lit(float(bins))
            ),
        )
        .cast("int")
        .alias(f"bin_{i}")
        for i, c in enumerate(feature_cols)
    ]
    cur = persist_tracked(
        feats.crossJoin(F.broadcast(mm)).select(
            *binned_cols,
            F.col(label_col).cast("int").alias("y"),
            F.lit(1).alias("node"),
        )
    )

    def bin_of_feat(prefix: str = "") -> F.Column:
        expr = F.lit(None).cast("int")
        for i in reversed(range(nf)):
            expr = F.when(F.col("feat") == i, F.col(f"{prefix}bin_{i}")).otherwise(
                expr
            )
        return expr

    level_splits: list[DataFrame] = []
    for _ in range(depth):
        long = cur.select(
            "node",
            "y",
            F.posexplode(
                F.array(*[F.col(f"bin_{i}") for i in range(nf)])
            ).alias("feat", "bin"),
        )
        g = long.groupBy("node", "feat", "bin").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("pos"),
        )
        wcum = W.partitionBy("node", "feat").orderBy("bin")
        wall = W.partitionBy("node", "feat")
        c = g.select(
            "node",
            "feat",
            "bin",
            F.sum("n").over(wcum).cast("bigint").alias("nl"),
            F.sum("pos").over(wcum).cast("bigint").alias("posl"),
            F.sum("n").over(wall).cast("bigint").alias("nt"),
            F.sum("pos").over(wall).cast("bigint").alias("post"),
        ).withColumns(
            {
                "nr": (F.col("nt") - F.col("nl")).cast("bigint"),
                "posr": (F.col("post") - F.col("posl")).cast("bigint"),
            }
        )
        scored = c.filter(F.col("nr") > 0).select(
            "node",
            "feat",
            "bin",
            "nt",
            "post",
            (
                _gini_pair(F.col("nl"), F.col("posl"))
                + _gini_pair(F.col("nr"), F.col("posr"))
            ).alias("score"),
            _gini_pair(F.col("nt"), F.col("post")).alias("parent_imp"),
        )
        best = (
            scored.filter(F.col("score") < F.col("parent_imp"))
            .withColumn(
                "rk",
                F.row_number().over(
                    W.partitionBy("node").orderBy("score", "feat", "bin")
                ),
            )
            .filter(F.col("rk") == 1)
            .select("node", "feat", F.col("bin").alias("sbin"), "nt", "post")
        )
        best = persist_tracked(best)
        level_splits.append(best)
        cur = persist_tracked(
            cur.join(F.broadcast(best.select("node", "feat", "sbin")), "node", "left")
            .select(
                *[F.col(f"bin_{i}") for i in range(nf)],
                "y",
                F.when(F.col("feat").isNull(), F.col("node"))
                .otherwise(
                    F.col("node") * 2
                    + (bin_of_feat() > F.col("sbin")).cast("int")
                )
                .alias("node"),
            )
        )

    thr = F.lit(None).cast(_D)
    for i in reversed(range(nf)):
        thr = F.when(
            F.col("feat") == i,
            F.col(f"mn_{i}")
            + (F.col(f"mx_{i}") - F.col(f"mn_{i}"))
            * ((F.col("sbin") + 1).cast(_D) / F.lit(float(bins))),
        ).otherwise(thr)
    splits = None
    for b in level_splits:
        splits = b if splits is None else splits.unionAll(b)
    split_rows = splits.crossJoin(F.broadcast(mm)).select(
        "node",
        F.lit("split").alias("kind"),
        F.col("feat").alias("feature"),
        F.col("sbin").alias("bin"),
        F.round(thr, 6).alias("thr"),
        F.col("nt").alias("n"),
        F.col("post").alias("pos"),
        F.lit(None).cast("int").alias("pred"),
    )
    leaf_rows = (
        cur.groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("pos"),
        )
        .select(
            "node",
            F.lit("leaf").alias("kind"),
            F.lit(None).cast("int").alias("feature"),
            F.lit(None).cast("int").alias("bin"),
            F.lit(None).cast(_D).alias("thr"),
            "n",
            "pos",
            (F.col("pos") * 2 > F.col("n")).cast("int").alias("pred"),
        )
    )
    return split_rows.unionAll(leaf_rows)
