"""Round-10 second-wave invariants: Bradley-Terry MM ranking,
sorted-neighborhood blocking + Fellegi-Sunter EM, relational CART."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.ranking import bradley_terry, duel_counts
from meerpipe_spark.operators.reconcile import (
    fellegi_sunter_em,
    fellegi_sunter_posteriors,
    sorted_neighborhood_pairs,
)
from meerpipe_spark.operators.tree import binned_split_tree


def _duels(spark, spec):
    rows = []
    for winner, loser, n in spec:
        rows += [Row(winner=winner, loser=loser)] * n
    return spark.createDataFrame(rows)


def test_bradley_terry_orders_by_strength(spark):
    duels = _duels(
        spark,
        [("A", "B", 9), ("B", "A", 1), ("B", "C", 9), ("C", "B", 1),
         ("A", "C", 9), ("C", "A", 1)],
    )
    out = {r["item"]: r for r in bradley_terry(duels, iters=8).collect()}
    assert out["A"]["score"] > out["B"]["score"] > out["C"]["score"]
    assert out["A"]["wins"] == 18 and out["C"]["wins"] == 2
    assert out["A"]["n_duels"] == 20
    # mean-normalized each round: scores average to ~1
    mean = sum(r["score"] for r in out.values()) / 3
    assert abs(mean - 1.0) < 1e-9


def test_bradley_terry_zero_win_item_finite(spark):
    duels = _duels(spark, [("A", "D", 5), ("B", "D", 5), ("A", "B", 3), ("B", "A", 3)])
    out = {r["item"]: r for r in bradley_terry(duels, iters=6).collect()}
    assert out["D"]["wins"] == 0
    assert 0.0 < out["D"]["score"] < out["A"]["score"]
    assert out["D"]["score"] == min(r["score"] for r in out.values())


def test_bradley_terry_partition_invariant(spark):
    duels = _duels(
        spark,
        [("A", "B", 7), ("B", "C", 5), ("C", "A", 2), ("A", "C", 6), ("B", "A", 4)],
    )
    a = {r["item"]: round(r["score"], 9) for r in bradley_terry(duels, iters=6).collect()}
    b = {
        r["item"]: round(r["score"], 9)
        for r in bradley_terry(duels.repartition(13), iters=6).collect()
    }
    assert a == b


def test_bradley_terry_bcast_ceiling_is_cost_only(spark, monkeypatch):
    """r13 optimization: the model-sized score/stat frames broadcast into
    the MM-round joins when the known pair count fits _BCAST_MAX_ROWS.
    The ceiling must be COST-ONLY — forcing the shuffle path (ceiling 0)
    must reproduce the broadcast path's scores to the last bit."""
    import meerpipe_spark.operators.ranking as R

    duels = _duels(
        spark,
        [("A", "B", 7), ("B", "C", 5), ("C", "A", 2), ("A", "C", 6), ("B", "A", 4)],
    )
    with_bcast = sorted(map(tuple, bradley_terry(duels, iters=6).collect()))
    monkeypatch.setattr(R, "_BCAST_MAX_ROWS", 0)
    shuffled = sorted(map(tuple, bradley_terry(duels, iters=6).collect()))
    assert with_bcast == shuffled


def test_duel_counts_symmetric_pairs(spark):
    duels = _duels(spark, [("A", "B", 3), ("B", "A", 2)])
    _, wins, pairs = duel_counts(duels)
    p = {(r["i"], r["j"]): r["n_ij"] for r in pairs.collect()}
    assert p[("A", "B")] == 5 and p[("B", "A")] == 5
    w = {r["item"]: r["wins"] for r in wins.collect()}
    assert w == {"A": 3, "B": 2}


def test_sorted_neighborhood_linear_pairing(spark):
    rows = [Row(id=i, v=float(i)) for i in range(10)]
    recs = spark.createDataFrame(rows)
    pairs = sorted_neighborhood_pairs(
        recs, "id", ["v"], F.lit(0).cast("bigint"), ["v"], window=2
    ).collect()
    # one block of 10 sorted records, w=2 -> 9 + 8 = 17 pairs
    assert len(pairs) == 17
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert all(b in (a + 1, a + 2) for a, b in got)
    assert all(r["b_v"] >= r["a_v"] for r in pairs)


def test_fs_em_recovers_planted_mixture(spark):
    # 300 planted matches (agree on both strong fields), 700 unmatched
    # (rarely agree); EM from the generic start must separate them.
    rows = []
    for i in range(1000):
        if i % 10 < 3:
            rows.append(Row(a_x=1, a_y=1 if i % 17 else 0))
        else:
            rows.append(Row(a_x=1 if i % 11 == 0 else 0, a_y=1 if i % 13 == 0 else 0))
    pairs = spark.createDataFrame(rows)
    model = fellegi_sunter_em(pairs, ["a_x", "a_y"], iters=8).collect()[0]
    assert 0.2 < model["p"] < 0.4
    assert model["m_0"] > 0.9 and model["m_1"] > 0.8
    assert model["u_0"] < 0.2 and model["u_1"] < 0.2
    scored = fellegi_sunter_posteriors(
        pairs, ["a_x", "a_y"], spark.createDataFrame([model])
    )
    hi = scored.filter((F.col("a_x") == 1) & (F.col("a_y") == 1)).agg(
        F.min("w")
    ).collect()[0][0]
    lo = scored.filter((F.col("a_x") == 0) & (F.col("a_y") == 0)).agg(
        F.max("w")
    ).collect()[0][0]
    assert hi > 0.5 > lo


def test_tree_finds_axis_aligned_split(spark):
    # y = x0 >= 0.5 exactly (grid-aligned: bin<=9 <=> x0 < 0.5); x1 is
    # noise -> root must split on feature 0 at 0.5 and both leaves pure.
    rows = [
        Row(x0=i / 100.0, x1=float((i * 37) % 100), y=1 if i / 100.0 >= 0.5 else 0)
        for i in range(101)
    ]
    out = binned_split_tree(
        spark.createDataFrame(rows), ["x0", "x1"], "y", depth=1, bins=20
    ).collect()
    splits = [r for r in out if r["kind"] == "split"]
    leaves = {r["node"]: r for r in out if r["kind"] == "leaf"}
    assert len(splits) == 1 and splits[0]["feature"] == 0
    assert abs(splits[0]["thr"] - 0.5) < 0.06
    assert set(leaves) == {2, 3}
    assert leaves[2]["pos"] == 0 and leaves[2]["pred"] == 0
    assert leaves[3]["pos"] == leaves[3]["n"] and leaves[3]["pred"] == 1


def test_tree_pure_node_stays_leaf(spark):
    rows = [Row(x0=float(i), y=1) for i in range(50)]
    out = binned_split_tree(spark.createDataFrame(rows), ["x0"], "y", depth=2, bins=8)
    rows_out = out.collect()
    assert [r["kind"] for r in rows_out] == ["leaf"]
    assert rows_out[0]["node"] == 1 and rows_out[0]["pred"] == 1


def test_tree_depth2_splits_both_children(spark):
    # stripes: y depends on x0 quartile (low and high -> 1) so depth-2
    # needs a root split plus meaningful child splits.
    rows = [
        Row(x0=i / 200.0, y=1 if (i < 50 or i >= 150) else 0) for i in range(200)
    ]
    out = binned_split_tree(
        spark.createDataFrame(rows), ["x0"], "y", depth=2, bins=16
    ).collect()
    splits = {r["node"]: r for r in out if r["kind"] == "split"}
    leaves = {r["node"]: r for r in out if r["kind"] == "leaf"}
    assert 1 in splits
    # every leaf pure, and the four quartile regions are separated
    assert all(l["pos"] in (0, l["n"]) for l in leaves.values())
    total = sum(l["n"] for l in leaves.values())
    assert total == 200


def test_als_reconstructs_rank2_matrix(spark):
    from meerpipe_spark.operators.als import als_rank2, als_rmse

    # exact rank-2 ratings r = p·q built from known factors: ALS must
    # drive training RMSE far below the rating scale
    rows = []
    for u in range(20):
        pu = (1.0 + (u % 4), 2.0 - (u % 3) * 0.5)
        for i in range(15):
            qi = (0.5 + (i % 5) * 0.3, 1.0 + (i % 2))
            rows.append(Row(u=u, i=i, r=pu[0] * qi[0] + pu[1] * qi[1]))
    ratings = spark.createDataFrame(rows)
    userf, itemf = als_rank2(ratings, iters=6, reg=0.01)
    m = als_rmse(ratings, userf, itemf).collect()[0]
    assert m["n_ratings"] == 300
    assert m["rmse"] < 0.05
    assert userf.count() == 20 and itemf.count() == 15


def test_als_partition_invariant(spark):
    from meerpipe_spark.operators.als import als_rank2

    rows = [
        Row(u=u, i=i, r=float((u * 7 + i * 3) % 11 + 1))
        for u in range(10)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows)
    a = {r["u"]: (round(r["p1"], 8), round(r["p2"], 8))
         for r in als_rank2(df, iters=3)[0].collect()}
    b = {r["u"]: (round(r["p1"], 8), round(r["p2"], 8))
         for r in als_rank2(df.repartition(17), iters=3)[0].collect()}
    assert a == b


def test_markov_attribution_semantics(spark):
    from meerpipe_spark.operators.funnel import markov_attribution

    # deterministic journeys: channel A always precedes conversion,
    # channel B never reaches it -> removing A kills all conversion,
    # removing B none.
    rows = []
    eid = 0
    for u in range(10):
        for step, t in enumerate(["A", "purchase"] if u % 2 == 0 else ["B"]):
            rows.append(Row(user_id=u, event_type=t, ts=float(step), event_id=eid))
            eid += 1
    ev = spark.createDataFrame(rows)
    out = {
        r["channel"]: r
        for r in markov_attribution(
            ev, ["A", "B"], order_cols=("ts", "event_id"), iters=10
        ).collect()
    }
    assert abs(out["A"]["removal_effect"] - 1.0) < 1e-9
    assert abs(out["B"]["removal_effect"] - 0.0) < 1e-9
    assert abs(out["A"]["share"] - 1.0) < 1e-9
    assert abs(out["A"]["base_cvr"] - 0.5) < 1e-9


def test_markov_attribution_truncates_at_first_conversion(spark):
    from meerpipe_spark.operators.funnel import markov_attribution

    # post-conversion events must not contribute transitions: channel C
    # appears only AFTER purchase, so its removal effect is exactly 0.
    rows = [
        Row(user_id=1, event_type=t, ts=float(i), event_id=i)
        for i, t in enumerate(["A", "purchase", "C", "C"])
    ]
    out = {
        r["channel"]: r
        for r in markov_attribution(
            spark.createDataFrame(rows), ["A", "C"], iters=8
        ).collect()
    }
    assert abs(out["C"]["removal_effect"]) < 1e-12
    assert abs(out["A"]["removal_effect"] - 1.0) < 1e-9


def test_betweenness_path_graph(spark):
    from meerpipe_spark.operators.graph import betweenness_sampled

    # path 1-2-3-4-5, sources {1, 5}: on a path every interior node is
    # a cut vertex; Brandes dependency from s=1 gives delta(2)=3,
    # delta(3)=2, delta(4)=1 (and symmetrically from s=5).
    und = [(i, i + 1) for i in range(1, 5)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in und] + [Row(src=b, dst=a) for a, b in und]
    )
    sources = spark.createDataFrame([Row(node=1), Row(node=5)])
    bc = {r["node"]: r["bc"] for r in
          betweenness_sampled(edges, sources, levels=4).collect()}
    assert bc[2] == 4.0 and bc[3] == 4.0 and bc[4] == 4.0
    assert bc[1] == 0.0 and bc[5] == 0.0  # endpoints of the other BFS


def test_betweenness_sigma_counts_parallel_paths(spark):
    from meerpipe_spark.operators.graph import betweenness_sampled

    # diamond 1->{2,3}->4: two shortest paths to 4, so delta(2) =
    # delta(3) = sigma_ratio 1/2 each; node 4 gets 0.
    und = [(1, 2), (1, 3), (2, 4), (3, 4)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in und] + [Row(src=b, dst=a) for a, b in und]
    )
    sources = spark.createDataFrame([Row(node=1)])
    bc = {r["node"]: r["bc"] for r in
          betweenness_sampled(edges, sources, levels=3).collect()}
    assert bc[2] == 0.5 and bc[3] == 0.5 and bc[4] == 0.0


def test_rake_segments_and_scores(spark):
    from meerpipe_spark.operators.text import rake_keyphrases

    # "deep learning" appears twice as a phrase; "fast" once alone.
    # deg(deep)=4, freq=2 -> 2.0; deg(learning)=4, freq=2 -> 2.0;
    # phrase "deep learning" scores 4.0 > "fast" at 1.0.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="deep learning the fast a deep learning"),
            Row(doc_id=2, text="fast the fast"),
        ]
    )
    out = rake_keyphrases(docs, ["a", "the"], top_per_doc=3).collect()
    d1 = {r["rk"]: r for r in out if r["doc_id"] == 1}
    # both occurrences of the top phrase rank first (occurrence-level
    # candidates, canonical RAKE), then the lone single word
    assert d1[1]["phrase"] == "deep learning" == d1[2]["phrase"]
    assert d1[1]["score"] == 4_000_000 and d1[1]["n_words"] == 2
    assert d1[3]["phrase"] == "fast" and d1[3]["score"] == 1_000_000
    d2 = {r["rk"]: r for r in out if r["doc_id"] == 2}
    # doc 2 has two single-word "fast" phrases, tie broken by phrase_id
    assert d2[1]["phrase"] == "fast" and d2[2]["phrase"] == "fast"


def test_rake_empty_token_is_separator(spark):
    from meerpipe_spark.operators.text import rake_keyphrases

    docs = spark.createDataFrame([Row(doc_id=1, text="alpha beta  gamma ")])
    out = rake_keyphrases(docs, ["the"], top_per_doc=5).collect()
    phrases = sorted(r["phrase"] for r in out)
    # double space and trailing space split candidates
    assert phrases == ["alpha beta", "gamma"]


def test_tree_constant_feature_is_ignored(spark):
    # a constant feature must not crash the grid (ANSI division) and
    # must never be chosen; the informative feature still splits.
    rows = [Row(x0=5.0, x1=i / 50.0, y=1 if i >= 25 else 0) for i in range(50)]
    out = binned_split_tree(
        spark.createDataFrame(rows), ["x0", "x1"], "y", depth=1, bins=10
    ).collect()
    splits = [r for r in out if r["kind"] == "split"]
    assert len(splits) == 1 and splits[0]["feature"] == 1
    leaves = {r["node"]: r for r in out if r["kind"] == "leaf"}
    assert all(l["pos"] in (0, l["n"]) for l in leaves.values())
