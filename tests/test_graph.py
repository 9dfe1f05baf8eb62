"""Fixed-point PageRank: exactness, invariance, and ranking sanity."""

from __future__ import annotations

from pyspark.sql import Row

from meerpipe_spark.operators.graph import PAGERANK_SCALE, pagerank_fixed_point


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_cycle_ranks_are_equal(spark):
    # a→b→c→a: perfect symmetry ⇒ identical integer ranks
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    ranks = {r.node: r.rank for r in pagerank_fixed_point(e, iters=10).collect()}
    assert len(set(ranks.values())) == 1
    # mass: ≤ scale, and within the floor-loss budget (≤ 1 unit/node/round)
    assert sum(ranks.values()) <= PAGERANK_SCALE
    assert sum(ranks.values()) >= PAGERANK_SCALE - 10 * 3 * 2


def test_hub_outranks_leaves(spark):
    e = _edges(spark, [(f"u{i}", "hub") for i in range(10)])
    ranks = {r.node: r.rank for r in pagerank_fixed_point(e, iters=10).collect()}
    assert ranks["hub"] > max(v for k, v in ranks.items() if k != "hub")
    # leaves are sinks of nothing: exactly the base share each round
    leaf_vals = {v for k, v in ranks.items() if k != "hub"}
    assert len(leaf_vals) == 1


def test_partitioning_invariance_bit_exact(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(200)]
    a = pagerank_fixed_point(_edges(spark, pairs).repartition(1), iters=6)
    b = pagerank_fixed_point(_edges(spark, pairs).repartition(16), iters=6)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # integer arithmetic: identical to the last bit
