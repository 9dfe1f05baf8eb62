"""Round-14 optimization equality tests.

Every r14 plan-shape change must be value-invisible. The pattern
(inherited from test_round13): run the operator twice in the same
session — once on the r14 fast path, once with the relevant ceiling
monkeypatched to 0 so the code takes the pre-r14 (shuffle / full
re-enumeration) path — and assert bit-identical sorted rows.
Per ADVICE r13 item 3, originals are captured and restored via
monkeypatch.setattr (never re-hardcoded defaults).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import meerpipe_spark.operators.graph as G


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def copurchase_pairs(spark, sf_dir):
    from meerpipe_spark.io import load_tables

    li = load_tables(spark, sf_dir)["lineitem"]
    pp = li.select("l_orderkey", "l_partkey").distinct()
    a = pp.select(F.col("l_orderkey").alias("kk"), F.col("l_partkey").alias("src"))
    b = pp.select(F.col("l_orderkey").alias("kk"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "kk")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def test_ppmi_fused_rounds_equal_shuffle_rounds(spark, sf_dir, monkeypatch, copurchase_pairs):
    # skip-gram pairs from short deterministic walks over the
    # co-purchase graph — the ppmi lane's real input shape
    from meerpipe_spark.operators.graph import (
        deterministic_walks,
        ppmi_spectral_embeddings,
        skipgram_pairs,
    )

    co = copurchase_pairs
    edges = co.unionByName(
        co.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    starts = edges.select(F.col("src").alias("node")).distinct().filter(
        F.col("node") % 25 == 0
    ).select(F.col("node").alias("walk_id"), "node")
    pairs = skipgram_pairs(
        deterministic_walks(edges, starts, steps=4), window=2
    ).localCheckpoint()

    fast = _rows(ppmi_spectral_embeddings(pairs, iters=3))
    monkeypatch.setattr(G, "_BCAST_STATE_MAX_ROWS", 0)
    slow = _rows(ppmi_spectral_embeddings(pairs, iters=3))
    assert fast and fast == slow


def test_ktruss_incremental_equals_full_reenumeration(spark, monkeypatch, copurchase_pairs):
    from meerpipe_spark.operators.graph import k_truss

    co = copurchase_pairs.localCheckpoint()
    # k=4 on the co-purchase graph peels progressively (several
    # non-converged rounds), so the incremental decrement path really
    # fires; rounds=4 exercises the post-loop final-support branch too
    fast = _rows(k_truss(co, k=4, rounds=4))
    monkeypatch.setattr(G, "_BCAST_STATE_MAX_ROWS", 0)
    slow = _rows(k_truss(co, k=4, rounds=4))
    assert fast and fast == slow


def test_ktruss_incremental_multi_removed_edge_triangles(spark, monkeypatch):
    # Adversarial micro-graph: two triangles sharing an edge plus a
    # pendant triangle chain, where one peel removes SEVERAL edges of
    # the same dead triangle — the distinct-on-sorted-triple step must
    # decrement each survivor exactly once. Compare against the full
    # re-enumeration on the same input.
    from meerpipe_spark.operators.graph import k_truss

    edges = [
        (1, 2), (1, 3), (2, 3),          # triangle A
        (2, 4), (3, 4),                  # triangle B shares (2,3)
        (4, 5), (4, 6), (5, 6),          # triangle C hangs off 4
        (1, 4),                          # closes extra triangles
        (6, 7),                          # zero-triangle pendant edge
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint").localCheckpoint()
    fast = _rows(k_truss(df, k=3, rounds=3))
    fast4 = _rows(k_truss(df, k=4, rounds=3))
    monkeypatch.setattr(G, "_BCAST_STATE_MAX_ROWS", 0)
    assert fast == _rows(k_truss(df, k=3, rounds=3))
    assert fast4 == _rows(k_truss(df, k=4, rounds=3))
