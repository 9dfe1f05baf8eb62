"""Round-11 additions: parameterized rank-k ALS / depth-d CART
(VERDICT r10 item 7), plus the ADVICE r10 API-edge guards."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F


def _rank_k_ratings(spark, k: int, n_u: int = 24, n_i: int = 18):
    """Exact rank-k ratings from deterministic integer-formula factors."""
    rows = []
    for u in range(n_u):
        pu = [1.0 + ((u * (f + 2)) % 5) * 0.4 for f in range(k)]
        for i in range(n_i):
            qi = [0.5 + ((i * (f + 3)) % 7) * 0.3 for f in range(k)]
            rows.append(Row(u=u, i=i, r=sum(a * b for a, b in zip(pu, qi))))
    return spark.createDataFrame(rows)


def test_als_rank_k_matches_rank2_at_k2(spark):
    from meerpipe_spark.operators.als import als_rank2, als_rank_k

    rows = [
        Row(u=u, i=i, r=float((u * 7 + i * 3) % 11 + 1))
        for u in range(10)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows)
    u2, _ = als_rank2(df, iters=3, reg=0.5)
    uk, _ = als_rank_k(df, k=2, iters=3, reg=0.5)
    a = {r["u"]: (r["p1"], r["p2"]) for r in u2.collect()}
    b = {r["u"]: tuple(r["p"]) for r in uk.collect()}
    assert set(a) == set(b)
    for u in a:
        # same init, same sufficient stats; Cramer vs LAPACK solve of
        # the same 2x2 systems — identical to float noise
        assert a[u][0] == pytest.approx(b[u][0], abs=1e-9)
        assert a[u][1] == pytest.approx(b[u][1], abs=1e-9)


def test_als_rank_k_recovers_rank4_matrix(spark):
    from meerpipe_spark.operators.als import als_rank_k, als_rmse_k

    ratings = _rank_k_ratings(spark, k=4)
    userf, itemf = als_rank_k(ratings, k=4, iters=6, reg=0.01)
    m = als_rmse_k(ratings, userf, itemf).collect()[0]
    assert m["n_ratings"] == 24 * 18
    assert m["rmse"] < 0.05


def test_als_rank_k_objective_decreases(spark):
    from meerpipe_spark.operators.als import als_rank_k, als_rmse_k

    reg = 0.3
    rows = [
        Row(u=u, i=i, r=float((u * 5 + i * 11) % 13 + 1))
        for u in range(15)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    objs = []
    for iters in (1, 2, 4):
        uf, itf = als_rank_k(df, k=4, iters=iters, reg=reg)
        objs.append(
            als_rmse_k(df, uf, itf, reg=reg).collect()[0]["objective"]
        )
    # each extra alternation provably non-increases the ridge objective
    assert objs[1] <= objs[0] + 1e-6
    assert objs[2] <= objs[1] + 1e-6


def test_als_rank_k_partition_invariant(spark):
    from meerpipe_spark.operators.als import als_rank_k

    rows = [
        Row(u=u, i=i, r=float((u * 7 + i * 3) % 11 + 1))
        for u in range(10)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows)
    a = {r["u"]: tuple(round(x, 8) for x in r["p"])
         for r in als_rank_k(df, k=3, iters=2)[0].collect()}
    b = {r["u"]: tuple(round(x, 8) for x in r["p"])
         for r in als_rank_k(df.repartition(17), k=3, iters=2)[0].collect()}
    assert a == b


def test_als_iter_and_rank_guards(spark):
    from meerpipe_spark.operators.als import als_rank2, als_rank_k

    df = spark.createDataFrame([Row(u=0, i=0, r=1.0)])
    with pytest.raises(ValueError, match="iters >= 1"):
        als_rank2(df, iters=0)
    with pytest.raises(ValueError, match="iters >= 1"):
        als_rank_k(df, k=2, iters=0)
    with pytest.raises(ValueError, match="k >= 1"):
        als_rank_k(df, k=0)


def test_tree_depth3_separates_hierarchical_stripes(spark):
    from meerpipe_spark.operators.tree import binned_split_tree

    # Hierarchical-gain stripes (greedy-separable, unlike alternating
    # parity where midpoint cuts have zero Gini gain): [0,.125)=0,
    # [.125,.25)=1, [.25,.5)=0, [.5,1]=1. Greedy root picks 0.5, the
    # left child 0.25, its left child 0.125 — exactly depth 3, all
    # leaves pure. x0 spans [0,1] inclusive so grid edges k/32 are
    # binary-exact and every stripe boundary lands on a bin edge.
    n = 400
    rows = []
    for i in range(n + 1):
        x = i / float(n)
        y = 1 if x >= 0.5 else (0 if x >= 0.25 else (1 if x >= 0.125 else 0))
        rows.append(Row(x0=x, y=y))
    out = binned_split_tree(
        spark.createDataFrame(rows), ["x0"], "y", depth=3, bins=32
    ).collect()
    leaves = [r for r in out if r["kind"] == "leaf"]
    splits = {r["node"]: r for r in out if r["kind"] == "split"}
    assert sum(l["n"] for l in leaves) == n + 1
    assert all(l["pos"] in (0, l["n"]) for l in leaves)
    assert len(leaves) == 4 and len(splits) == 3
    assert splits[1]["thr"] == pytest.approx(0.5)
    assert splits[2]["thr"] == pytest.approx(0.25)
    assert splits[4]["thr"] == pytest.approx(0.125)
    # node ids form a proper binary tree: every leaf's ancestors split
    for l in leaves:
        node = l["node"]
        while node > 1:
            node //= 2
            assert node in splits


def _tree_train_errors(out_rows) -> int:
    """Misclassified training rows implied by the fitted tree's leaf
    counts (majority leaf prediction)."""
    return sum(
        min(r["pos"], r["n"] - r["pos"])
        for r in out_rows
        if r["kind"] == "leaf"
    )


def test_tree_deeper_never_worse_on_training(spark):
    from meerpipe_spark.operators.tree import binned_split_tree

    # each extra level only ever refines leaves (splits require strict
    # impurity reduction), so training error is monotone in depth
    rows = [
        Row(x0=(i % 25) / 25.0, x1=((i * 17) % 50) / 50.0,
            y=1 if ((i % 25) / 25.0) * 2 + ((i * 17) % 50) / 50.0 > 1.2 else 0)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows)
    errs = [
        _tree_train_errors(
            binned_split_tree(df, ["x0", "x1"], "y", depth=d, bins=16).collect()
        )
        for d in (1, 2, 3)
    ]
    assert errs[1] <= errs[0]
    assert errs[2] <= errs[1]


def test_tree_depth_nested_consistency(spark):
    from meerpipe_spark.operators.tree import binned_split_tree

    # greedy CART: the depth-2 prefix of a depth-3 fit is the depth-2
    # fit (same data, same grid) — deeper fitting never rewrites
    # shallower decisions.
    rows = [
        Row(
            x0=(i % 20) / 20.0,
            x1=((i * 13) % 40) / 40.0,
            y=1 if ((i % 20) / 20.0 + ((i * 13) % 40) / 40.0) > 0.8 else 0,
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    d2 = binned_split_tree(df, ["x0", "x1"], "y", depth=2, bins=16).collect()
    d3 = binned_split_tree(df, ["x0", "x1"], "y", depth=3, bins=16).collect()
    s2 = {r["node"]: (r["feature"], r["bin"]) for r in d2 if r["kind"] == "split"}
    s3 = {r["node"]: (r["feature"], r["bin"]) for r in d3 if r["kind"] == "split"}
    for node, choice in s2.items():
        assert s3.get(node) == choice


def test_gini_decimal_matches_double_small_counts(spark):
    # the decimal(38,0) squares (ADVICE r10 overflow fix) must round to
    # exactly the double values the old bigint path produced for any
    # count far below the old overflow cliff
    from meerpipe_spark.operators.tree import _gini_pair

    df = spark.createDataFrame(
        [Row(n=n, pos=p) for n in (1, 2, 7, 10**9) for p in (0, 1, n // 2, n)]
    )
    got = df.select(
        _gini_pair(F.col("n").cast("bigint"), F.col("pos").cast("bigint")).alias("g"),
        (
            F.col("n").cast("double")
            - (
                F.col("pos").cast("double") * F.col("pos")
                + (F.col("n") - F.col("pos")).cast("double")
                * (F.col("n") - F.col("pos"))
            )
            / F.col("n").cast("double")
        ).alias("ref"),
    ).collect()
    for r in got:
        assert r["g"] == pytest.approx(r["ref"], rel=1e-12)


def test_gini_decimal_survives_3e9_counts(spark):
    # the exact scenario ADVICE flagged: a node side beyond ~3.0e9
    # same-class rows overflowed bigint pos^2 under ANSI; decimal(38,0)
    # must return the exact-rounded double instead of throwing
    from meerpipe_spark.operators.tree import _gini_pair

    n, pos = 6_000_000_000, 4_000_000_000
    df = spark.createDataFrame([Row(n=n, pos=pos)])
    g = df.select(
        _gini_pair(F.col("n").cast("bigint"), F.col("pos").cast("bigint")).alias("g")
    ).collect()[0]["g"]
    neg = n - pos
    assert g == pytest.approx(n - (pos * pos + neg * neg) / n, rel=1e-12)
