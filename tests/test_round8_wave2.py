"""Unit tests for the round-8 second wave: shortest paths, deterministic
walks, Huber IRLS, one-pass k-fold CV, weighted reservoir sampling,
isotonic minimax, Pareto skyline, BWT runs, and the conformal /
segmented-regression constructions — each checked against a small
brute-force twin (the oracle sweep covers the cross-engine hashes; these
pin the SEMANTICS on handcrafted cases)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_sssp_exact_small_graph(spark):
    # path graph 1-2-3-4 with weights, plus a shortcut 1-4 and an island 9
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 5), (7, 9, 2)],
        "src BIGINT, dst BIGINT, w BIGINT",
    )
    und = edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    sources = spark.createDataFrame([(1,)], "node BIGINT")
    from meerpipe_spark.operators.graph import sssp_bellman_ford

    got = {r["node"]: r["dist"] for r in sssp_bellman_ford(und, sources, 6).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # shortcut (5) loses; island absent


def test_sssp_converged_rounds_are_identity(spark):
    edges = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 2)], "src BIGINT, dst BIGINT, w BIGINT"
    )
    sources = spark.createDataFrame([(1,)], "node BIGINT")
    from meerpipe_spark.operators.graph import sssp_bellman_ford

    d3 = sorted(map(tuple, sssp_bellman_ford(edges, sources, 3).collect()))
    d8 = sorted(map(tuple, sssp_bellman_ford(edges, sources, 8).collect()))
    assert d3 == d8 == [(1, 0), (2, 2), (3, 4)]


def test_deterministic_walks_follow_edges_and_replay(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (3, 2)], "src BIGINT, dst BIGINT"
    )
    starts = spark.createDataFrame([(100, 1), (200, 3)], "walk_id BIGINT, node BIGINT")
    from meerpipe_spark.operators.graph import deterministic_walks

    w1 = deterministic_walks(edges, starts, steps=5).collect()
    w2 = deterministic_walks(edges, starts, steps=5).collect()
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))  # replayable
    edge_set = {(1, 2), (1, 3), (2, 3), (3, 1), (3, 2)}
    by_walk = {}
    for r in w1:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for wid, path in by_walk.items():
        assert path[0] == (1 if wid == 100 else 3)
        for t in range(1, max(path) + 1):
            assert (path[t - 1], path[t]) in edge_set  # every hop is an edge
        assert max(path) == 5  # no sinks in this graph: full length


def test_huber_downweights_outliers(spark):
    # y = 10x plus three gross outliers; OLS bends toward them, Huber not
    rows = [(float(i), 10.0 * i) for i in range(1, 41)]
    rows += [(5.0, 5000.0), (10.0, 6000.0), (15.0, 7000.0)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE").withColumn(
        "g", F.lit("a")
    )
    from meerpipe_spark.operators.wlsfit import huber_line_fit

    r = huber_line_fit(
        df, ["g"], F.col("x"), F.col("y"), delta=50.0, iters=4
    ).first()
    assert abs(r["b"] - 10.0) < abs(r["b_ols"] - 10.0)  # more robust than OLS
    assert abs(r["b"] - 10.0) < 2.0
    assert r["n_downweighted"] >= 3
    assert 0.0 < r["mean_w"] <= 1.0


def test_kfold_cv_matches_direct_fit(spark):
    import numpy as np

    rows = [(i % 3, float(i), 2.0 * i + 1.0 + (i % 7) * 0.5) for i in range(60)]
    df = spark.createDataFrame(rows, "fold INT, x DOUBLE, y DOUBLE")
    from meerpipe_spark.operators.wlsfit import kfold_ols_cv

    got = {
        r["fold"]: r
        for r in kfold_ols_cv(df, F.col("fold"), F.col("x"), F.col("y")).collect()
    }
    data = np.array([(f, x, y) for f, x, y in rows])
    for f in (0, 1, 2):
        tr = data[data[:, 0] != f]
        va = data[data[:, 0] == f]
        b, a = np.polyfit(tr[:, 1], tr[:, 2], 1)
        pred = a + b * va[:, 1]
        rmse = math.sqrt(float(np.mean((va[:, 2] - pred) ** 2)))
        assert got[f]["n_train"] == len(tr)
        assert abs(got[f]["b"] - b) < 1e-8
        assert abs(got[f]["a"] - a) < 1e-8
        assert abs(got[f]["val_rmse"] - rmse) < 1e-8


def test_weighted_sample_prefers_heavy_rows(spark):
    # two-point masses: weight 1000 vs 1: the heavy row should win the
    # top-1 draw for the vast majority of salts
    rows = [(1, 1000), (2, 1)] + [(i, 1) for i in range(3, 30)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, n_chars BIGINT")
    from meerpipe_spark.operators.curation import weighted_sample_wor

    wins = 0
    for salt in ("s1", "s2", "s3", "s4", "s5", "s6", "s7", "s8"):
        top = weighted_sample_wor(df, "n_chars", k=1, salt=salt).first()
        wins += top["doc_id"] == 1
    assert wins >= 6  # P(win) ~ 1000/1028 per draw
    # determinism + exact k
    s1 = weighted_sample_wor(df, "n_chars", k=5).collect()
    s2 = weighted_sample_wor(df, "n_chars", k=5).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    assert len(s1) == 5


def _pava_reference(w, y):
    """Textbook sequential pool-adjacent-violators on (weight, value)."""
    blocks = [[wi, wi * yi] for wi, yi in zip(w, y)]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] / blocks[i][0] > blocks[i + 1][1] / blocks[i + 1][0] + 1e-15:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fitted = []
    consumed = 0
    for bw, bs in blocks:
        total_w = 0
        while total_w < bw:
            total_w += w[consumed]
            fitted.append(bs / bw)
            consumed += 1
    return fitted


def test_isotonic_minimax_equals_pava(spark):
    w = [4, 2, 3, 5, 1, 2, 6, 3]
    y = [0.1, 0.5, 0.3, 0.2, 0.9, 0.4, 0.6, 0.55]
    bins = spark.createDataFrame(
        [(i, wi, int(round(yi * wi * 100))) for i, (wi, yi) in enumerate(zip(w, y))],
        "bin INT, n BIGINT, pos BIGINT",
    )
    # use pos/100 scale: values are pos/(100*n) — same isotonic order
    from meerpipe_spark.operators.logreg import isotonic_fit_bins

    got = {
        r["bin"]: r["iso_rate"] for r in isotonic_fit_bins(bins, "bin", "n", "pos").collect()
    }
    ref = _pava_reference(w, [int(round(yi * wi * 100)) / wi for wi, yi in zip(w, y)])
    for i in range(len(w)):
        assert abs(got[i] - ref[i]) < 1e-9, (i, got[i], ref[i])
    # monotone non-decreasing
    seq = [got[i] for i in range(len(w))]
    assert all(a <= b + 1e-12 for a, b in zip(seq, seq[1:]))
    # non-vacuous: at least one pooled bin differs from its raw rate
    raw = [int(round(yi * wi * 100)) / wi for wi, yi in zip(w, y)]
    assert any(abs(r - g) > 1e-9 for r, g in zip(raw, seq))


def test_pareto_skyline_matches_bruteforce(spark, sf_dir):
    from meerpipe_spark.queries import QUERIES

    got = {
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in QUERIES["pareto_skyline_parts"].fn(spark, sf_dir).collect()
    }
    pts = [
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_size", "p_retailprice")
        .collect()
    ]
    def dominated(p):
        return any(
            q[2] <= p[2] and q[1] >= p[1] and (q[2] < p[2] or q[1] > p[1])
            for q in pts
        )
    brute = {p for p in pts if not dominated(p)}
    assert got == brute and got


def test_bwt_runs_small_corpus(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a b")], "doc_id BIGINT, text STRING"
    )
    from meerpipe_spark.queries import QUERIES  # noqa: F401  (registry import)

    # brute force: enumerate suffixes, sort, read preceding words
    corpus = {0: "a b a b".split(), 1: "b a b".split()}
    sfx = []
    for d, ws in corpus.items():
        for p in range(len(ws)):
            sfx.append((ws[p:], d, p))
    sfx.sort()
    bwt = ["^" if p == 0 else corpus[d][p - 1] for _, d, p in sfx]
    exp = {}
    prev = None
    for wd in bwt:
        n_occ, n_runs = exp.get(wd, (0, 0))
        exp[wd] = (n_occ + 1, n_runs + (1 if wd != prev else 0))
        prev = wd
    from meerpipe_spark.operators.ids import assign_dense_ranks
    from meerpipe_spark.operators.suffix import suffix_array_ranks

    sa = suffix_array_ranks(docs)
    base = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    prevw = base.select(
        "doc_id", (F.col("pos") + 1).alias("pos"), F.col("w").alias("bw")
    )
    bwt_df = sa.join(prevw, ["doc_id", "pos"], "left").select(
        "suffix_rank", "doc_id", "pos", F.coalesce("bw", F.lit("^")).alias("bw")
    )
    idxed = assign_dense_ranks(
        bwt_df, ["suffix_rank", "doc_id", "pos"], "idx"
    ).select("idx", "bw")
    nb = idxed.select((F.col("idx") + 1).alias("idx"), F.col("bw").alias("bw_prev"))
    got = {
        r["bw"]: (r["n_occ"], r["n_runs"])
        for r in idxed.join(nb, "idx", "left")
        .groupBy("bw")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.sum(
                F.when(
                    F.col("bw_prev").isNull() | (F.col("bw_prev") != F.col("bw")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_runs"),
        )
        .collect()
    }
    assert got == exp


def test_edit_verify_levenshtein_semantics(spark):
    # Spark's levenshtein must be the classic DP edit distance
    pairs = [("kitten", "sitting", 3), ("abc", "abc", 0), ("", "abc", 3), ("flaw", "lawn", 2)]
    df = spark.createDataFrame(pairs, "a STRING, b STRING, exp INT")
    bad = df.filter(F.levenshtein("a", "b") != F.col("exp")).count()
    assert bad == 0


def test_conformal_coverage_near_nominal(spark, sf_dir):
    from meerpipe_spark.queries import QUERIES

    r = QUERIES["conformal_interval_coverage"].fn(spark, sf_dir).first()
    assert r["n_calib"] > 0 and r["n_test"] > 0
    assert 0.80 <= r["coverage"] <= 1.0  # finite-sample conformal guarantee
    assert r["coverage"] >= 0.85  # nominal 0.9 with slack at small n


def test_segmented_breakpoint_recovers_change(spark):
    # slope 0 then slope 5 starting at x=30 (counts, integer)
    daily = spark.createDataFrame(
        [(i, 100) for i in range(30)] + [(i, 100 + 5 * (i - 30)) for i in range(30, 60)],
        "x BIGINT, y BIGINT",
    )
    from pyspark.sql import Window as W

    w = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = daily.select(
        "x",
        F.sum(F.lit(1)).over(w).alias("cn"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("tn"),
        F.sum("x").alias("tsx"),
        F.sum("y").alias("tsy"),
        F.sum(F.col("x") * F.col("x")).alias("tsxx"),
        F.sum(F.col("x") * F.col("y")).alias("tsxy"),
        F.sum(F.col("y") * F.col("y")).alias("tsyy"),
    )

    def sse(n, sx, sy, sxx, sxy, syy):
        num = n * sxy - sx * sy
        d = n * sxx - sx * sx
        return (
            syy.cast("double")
            - (sy * sy).cast("double") / n
            - num.cast("double") * num.cast("double") / (n.cast("double") * d.cast("double"))
        )

    cn = F.col("cn")
    rn = F.col("tn") - cn
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .filter((cn >= 5) & (rn >= 5))
        .select(
            F.col("x").alias("brk"),
            (
                sse(cn, F.col("sx"), F.col("sy"), F.col("sxx"), F.col("sxy"), F.col("syy"))
                + sse(
                    rn,
                    F.col("tsx") - F.col("sx"),
                    F.col("tsy") - F.col("sy"),
                    F.col("tsxx") - F.col("sxx"),
                    F.col("tsxy") - F.col("sxy"),
                    F.col("tsyy") - F.col("syy"),
                )
            ).alias("sse"),
        )
    )
    best = cand.orderBy("sse", "brk").first()
    assert 27 <= best["brk"] <= 31  # the true change point is x=30


def test_hits_star_graph(spark):
    # star: one part bought by everyone is the top authority
    edges = spark.createDataFrame(
        [(c, 99) for c in range(1, 6)] + [(1, 7), (2, 7)],
        "src BIGINT, dst BIGINT",
    )
    from meerpipe_spark.operators.graph import hits_scores

    hubs, auths = hits_scores(edges, rounds=4)
    a = {r["node"]: r["score"] for r in auths.collect()}
    h = {r["node"]: r["score"] for r in hubs.collect()}
    assert a[99] == 1.0 and a[99] > a[7]
    assert max(h.values()) == 1.0
    assert all(0.0 < v <= 1.0 for v in list(a.values()) + list(h.values()))
    # hubs 1 and 2 buy both items: strictly stronger than hub 3
    assert h[1] == h[2] > h[3]


def test_observation_metrics_api(spark):
    # Spark 4 Observation: pipeline QA counters piggybacked on the
    # action, no second scan of the data
    from pyspark.sql import Observation

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    obs = Observation("qa")
    out = df.observe(obs, F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    assert out.count() == 100
    got = obs.get
    assert got["n"] == 100 and got["sv"] == 9900


def test_ktruss_keeps_clique_drops_chain(spark):
    # K5 clique (every edge in 3 triangles) + a pendant chain
    import itertools

    clique = list(itertools.combinations(range(1, 6), 2))
    chain = [(5, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "src BIGINT, dst BIGINT")
    from meerpipe_spark.operators.graph import k_truss

    got = {(r["src"], r["dst"]): r["support"] for r in k_truss(edges, k=5, rounds=3).collect()}
    assert set(got) == set(clique)  # the chain is gone, the clique intact
    assert all(s == 3 for s in got.values())  # K5: each edge in 3 triangles
