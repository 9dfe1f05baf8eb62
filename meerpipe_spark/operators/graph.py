"""Iterative graph analytics as exact fixed-point arithmetic.

PageRank's float formulation can never be cross-engine hash-checked:
every iteration sums contributions in shuffle order, so the low bits
drift between partitionings, let alone engines. The variant here runs
the ENTIRE iteration in scaled bigint arithmetic (the same trick the
PCA operator uses for its covariance moments, similarity.py::
pca_power_projection): integer sums are exact and order-independent,
integer floor-division is deterministic, so 10 rounds later the ranks
are bit-identical in any engine — and ANSI-mode overflow is impossible
by construction (total mass ≤ scale, per-node rank < scale·85/100 + base).

Companion to the connected-components operators (dedup.py::
near_dup_components / _cc_contraction) — together they cover the two
graph primitives a dedup/curation pipeline actually needs: component
extraction for duplicate clusters, and a stationary-importance score
for canonical-document election inside a cluster (pick the highest-rank
node instead of min-id when link structure matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Rank mass is distributed over `scale` integer units; 1e12 keeps
#: per-node quantization error at 1e-12 of total mass while the largest
#: intermediate (rank·85) stays ~17 bits under the bigint ceiling.
PAGERANK_SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 10,
    scale: int = PAGERANK_SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Damped PageRank over a directed edge list (src, dst), all
    arithmetic in scaled integers.

    Per round:  r'(v) = base + Σ_{u→v} (r(u)·damp_num) DIV (damp_den·outdeg(u))
    with base = (scale·(damp_den−damp_num)) DIV (damp_den·N) — every op
    an exact bigint op, so the result is partitioning- and engine-
    invariant (hash-checkable; see the unrolled CTE oracle in
    queries.py::_pagerank_oracle_sql). Dangling nodes keep their base
    share and their damped mass decays — documented semantics, not
    redistributed (the floor losses likewise make Σr slightly < scale;
    determinism is the contract here, not mass conservation).

    Scale shape per round: one shuffle of (dst, contribution) pairs
    with map-side partial sums — the Pregel message pattern — plus a
    broadcast-or-shuffle join of the rank table against the edge list;
    lineage is truncated every round with localCheckpoint (the CC
    operators' pattern). Edge skew (a hub dst) is absorbed by the
    partial aggregation: mappers pre-sum per dst before the exchange.

    Returns (node, rank) with bigint rank in scale units.
    """
    edges = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    base = (scale * (damp_den - damp_num)) // (damp_den * n)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    e = edges.join(outdeg, "src").localCheckpoint()
    ranks = nodes.withColumn("r", F.lit(scale // n).cast("bigint"))
    for i in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                "dst",
                F.expr(f"(r * {damp_num}) DIV ({damp_den} * outdeg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("s"))
        )
        ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0))).cast("bigint").alias("r"),
        )
        # truncate lineage every few rounds, not every round: each eager
        # localCheckpoint is its own job, and a 3-round lineage (three
        # join+agg layers) is still cheap to analyze — 10 rounds go from
        # 10 materializations to 4 with identical integer results
        if i % 3 == 2 or i == iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.col("r").alias("rank"))
