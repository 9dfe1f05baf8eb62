"""Round-9 tests: ADVICE fixes (graph id-domain / k_truss guard,
launcher ledger atomicity, stream-offset restart monotonicity) and the
hard-negatives scale path (sampled k-means, join-based IVF assignment,
two-level quantizer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_deterministic_walks_wide_bigint_ids(spark):
    # ADVICE graph.py:395 — lpad(dst, 12) TRUNCATED ids wider than 12
    # digits, decoding a corrupted node. Pad is now 19 (max bigint).
    big = 10_000_000_000_001  # 14 digits
    edges = spark.createDataFrame(
        [(1, big), (big, 1)], "src BIGINT, dst BIGINT"
    )
    starts = spark.createDataFrame([(7, 1)], "walk_id BIGINT, node BIGINT")
    from meerpipe_spark.operators.graph import deterministic_walks

    path = {r["step"]: r["node"] for r in deterministic_walks(edges, starts, steps=2).collect()}
    assert path[0] == 1
    assert path[1] == big  # the only out-edge; decoded exactly
    assert path[2] == 1


def test_k_truss_rejects_k_below_3(spark):
    # ADVICE graph.py:468 — k<=2 silently computed the 3-truss (zero-
    # triangle edges never appear in the support aggregate); now rejected.
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src BIGINT, dst BIGINT")
    from meerpipe_spark.operators.graph import k_truss

    for bad in (0, 1, 2):
        with pytest.raises(ValueError, match="k >= 3"):
            k_truss(edges, k=bad)
    # k=3 on a triangle still works
    tri = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src BIGINT, dst BIGINT")
    got = sorted(map(tuple, k_truss(tri, k=3, rounds=2).collect()))
    assert got == [(1, 2, 1), (1, 3, 1), (2, 3, 1)]
