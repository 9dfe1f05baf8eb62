"""Round-13 optimization focused tests: every r13 change that touches an
operator's internals must prove the fast path is COST-ONLY (broadcast
ceilings, subtree materialization, step fusion) — same values, cheaper
plan."""

from __future__ import annotations

from pyspark.sql import Row


def test_als_bcast_ceiling_is_cost_only(spark, monkeypatch):
    """r13: the half-round ratings ⋈ factors joins broadcast the
    entity-sized factor frame when its known cardinality fits
    _BCAST_FACTOR_MAX_ROWS. Forcing the shuffle path (ceiling 0) must
    reproduce the broadcast path's factors."""
    import meerpipe_spark.operators.als as A
    from meerpipe_spark.operators.als import als_rank2

    rows = [
        Row(u=u, i=i, r=float((u * 7 + i * 3) % 11 + 1))
        for u in range(10)
        for i in range(8)
        if (u + i) % 3
    ]
    df = spark.createDataFrame(rows)
    a = {r["u"]: (round(r["p1"], 8), round(r["p2"], 8))
         for r in als_rank2(df, iters=3)[0].collect()}
    monkeypatch.setattr(A, "_BCAST_FACTOR_MAX_ROWS", 0)
    b = {r["u"]: (round(r["p1"], 8), round(r["p2"], 8))
         for r in als_rank2(df, iters=3)[0].collect()}
    assert a == b


def test_als_rank_k_bcast_ceiling_is_cost_only(spark, monkeypatch):
    import meerpipe_spark.operators.als as A
    from meerpipe_spark.operators.als import als_rank_k

    rows = [
        Row(u=u, i=i, r=float((u * 5 + i) % 9 + 1))
        for u in range(8)
        for i in range(6)
    ]
    df = spark.createDataFrame(rows)
    a = {r["u"]: tuple(round(x, 8) for x in r["p"])
         for r in als_rank_k(df, k=3, iters=2)[0].collect()}
    monkeypatch.setattr(A, "_BCAST_FACTOR_MAX_ROWS", 0)
    b = {r["u"]: tuple(round(x, 8) for x in r["p"])
         for r in als_rank_k(df, k=3, iters=2)[0].collect()}
    assert a == b


def test_betweenness_backward_bcast_is_cost_only(spark, monkeypatch):
    """r13: the backward (dependency-accumulation) joins broadcast the
    (source × node)-sized vs/ws/acc slices under the graph ceiling.
    Ceiling 0 (pure shuffle plan, the at-scale fallback) must reproduce
    the broadcast path's centralities exactly."""
    import meerpipe_spark.operators.graph as G
    from meerpipe_spark.operators.graph import betweenness_sampled

    und = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (2, 5)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in und] + [Row(src=b, dst=a) for a, b in und]
    )
    sources = spark.createDataFrame([Row(node=1), Row(node=5)])
    a = sorted(map(tuple, betweenness_sampled(edges, sources, levels=4).collect()))
    monkeypatch.setattr(G, "_BCAST_STATE_MAX_ROWS", 0)
    b = sorted(map(tuple, betweenness_sampled(edges, sources, levels=4).collect()))
    assert a == b


def test_markov_steps_fusion_matches_union_semantics(spark):
    """r13: the trailing-DROP step is emitted by a conditional explode
    in the SAME fact pass instead of a second window-recomputing union
    branch. Journeys with and without terminal drops must yield the
    exact pre-fusion transition semantics (hand-checked removal
    effects)."""
    from meerpipe_spark.operators.funnel import markov_attribution

    rows = []
    eid = 0
    # u0/u2/u4: view -> purchase (converting); u1/u3: view -> click end
    # (click gets the terminal DROP step)
    for u in range(5):
        journey = ["view", "purchase"] if u % 2 == 0 else ["view", "click"]
        for step, t in enumerate(journey):
            rows.append(Row(user_id=u, event_type=t, ts=float(step), event_id=eid))
            eid += 1
    out = {
        r["channel"]: r
        for r in markov_attribution(
            spark.createDataFrame(rows), ["view", "click"], iters=10
        ).collect()
    }
    # removing view kills every journey; removing click only the
    # non-converting ones (purchase still reached via view)
    assert abs(out["view"]["removal_effect"] - 1.0) < 1e-9
    assert abs(out["click"]["removal_effect"] - 0.0) < 1e-9
    assert abs(out["view"]["base_cvr"] - 0.6) < 1e-9


def test_fs_em_checkpoint_keeps_model_values(spark):
    """r13: fellegi_sunter_em materializes the 1-row model per round
    (O(iters) instead of O(iters²) passes). The EM fixed point on a
    separable mixture must be unchanged: matched twins agree on both
    fields, noise pairs on neither, so m_k -> hi and u_k -> lo."""
    from meerpipe_spark.operators.reconcile import fellegi_sunter_em

    rows = [Row(a_x=1, a_y=1)] * 20 + [Row(a_x=0, a_y=0)] * 80
    model = fellegi_sunter_em(
        spark.createDataFrame(rows), ["a_x", "a_y"], iters=8
    ).collect()[0]
    assert model["n_pairs"] == 100
    assert abs(model["p"] - 0.2) < 1e-3
    assert model["m_0"] > 0.99 and model["m_1"] > 0.99
    assert model["u_0"] < 1e-3 and model["u_1"] < 1e-3


def test_ktruss_early_exit_matches_fixed_rounds(spark):
    """r13: k_truss returns the materialized support table as soon as a
    round drops no edge (survivors are a subset of the round's input,
    so equal cardinality forces set equality and every later round is
    the identity). The early-exit result must equal the fully-unrolled
    computation exactly, on both a converged-at-round-1 graph and a
    graph that peels first."""
    import itertools

    from meerpipe_spark.operators.graph import k_truss

    clique = list(itertools.combinations(range(1, 6), 2))
    # pure K5 with k=5: round 1 drops nothing -> exit fires immediately;
    # rounds=1 (no room to exit early) is the unrolled reference
    k5 = spark.createDataFrame(clique, "src BIGINT, dst BIGINT")
    fast = sorted(map(tuple, k_truss(k5, k=5, rounds=4).collect()))
    ref = sorted(map(tuple, k_truss(k5, k=5, rounds=1).collect()))
    assert fast == ref
    assert fast == [(s, d, 3) for s, d in sorted(clique)]  # K5: support 3
    # K5 + pendant chain: round 1 peels the chain, round 2 converges ->
    # exit fires mid-loop; must equal the chain-free clique answer
    chain = [(5, 10), (10, 11), (11, 12)]
    g = spark.createDataFrame(clique + chain, "src BIGINT, dst BIGINT")
    peeled = sorted(map(tuple, k_truss(g, k=5, rounds=4).collect()))
    assert peeled == fast


def test_k_core_bcast_ceiling_is_cost_only(spark, monkeypatch):
    """r13: the peel rounds broadcast the node-sized alive set into the
    edge semi-joins when the initial node count fits the graph ceiling.
    Forcing the shuffle path (ceiling 0) must reproduce the broadcast
    path's core degrees exactly."""
    import meerpipe_spark.operators.graph as G
    from meerpipe_spark.operators.graph import k_core

    clique = [(a, b) for a in range(1, 7) for b in range(a + 1, 7)]  # K6: 5-core
    pairs = clique + [(i, (i * 7 + 3) % 40) for i in range(10, 200)]
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs if a != b], "src BIGINT, dst BIGINT"
    )
    fast = sorted(map(tuple, k_core(df, k=3, rounds=6).collect()))
    monkeypatch.setattr(G, "_BCAST_STATE_MAX_ROWS", 0)
    slow = sorted(map(tuple, k_core(df, k=3, rounds=6).collect()))
    assert fast == slow
    assert fast  # the probe graph keeps a non-empty 3-core


def test_cc_bcast_ceiling_is_cost_only(spark, monkeypatch):
    """r13: both connected-components algorithms broadcast their
    node-sized per-round state (labels / min tables) under
    SPARK_GRAFT_CC_BCAST_MAX_ROWS. Ceiling 0 must reproduce the
    components bit-exactly for propagation AND contraction."""
    import meerpipe_spark.operators.dedup as D
    from meerpipe_spark.operators.dedup import connected_components

    # two cliques + a long path (forces the auto probe into contraction)
    edges = (
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        + [(i, i + 1) for i in range(100, 140)]
    )
    df = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT")
    # ADVICE r13 item 3: restore the PRE-TEST ceiling between loop
    # iterations (re-hardcoding the default would mask an env-var
    # override during the second algorithm's fast run)
    orig_ceiling = D._BCAST_MAX_ROWS
    for alg in ("propagation", "contraction"):
        monkeypatch.setattr(D, "_BCAST_MAX_ROWS", orig_ceiling)
        fast = sorted(
            map(tuple, connected_components(df, algorithm=alg).collect())
        )
        monkeypatch.setattr(D, "_BCAST_MAX_ROWS", 0)
        slow = sorted(
            map(tuple, connected_components(df, algorithm=alg).collect())
        )
        assert fast == slow
    monkeypatch.setattr(D, "_BCAST_MAX_ROWS", orig_ceiling)
    # contraction reaches the true fixpoint on the long path (its round
    # bound is O(log^2 n), diameter-independent); explicit propagation
    # at default max_iters legitimately may not — that is the documented
    # reason algorithm="auto" probes and falls back.
    comp = {
        r["node"]: r["component"]
        for r in connected_components(df, algorithm="contraction").collect()
    }
    assert all(comp[i] == 100 for i in range(100, 141))
    assert all(comp[i] == 1 for i in range(1, 5))
    assert all(comp[i] == 10 for i in range(10, 14))
