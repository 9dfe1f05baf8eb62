"""table_diff / entity_match_candidates / triangle_count /
transition_matrix / skew_profile vs hand-computed results."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerpipe_spark.operators.graph import triangle_count
from meerpipe_spark.operators.reconcile import entity_match_candidates, table_diff


def test_table_diff_statuses(spark):
    v1 = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k INT, price DOUBLE, st STRING",
    )
    v2 = spark.createDataFrame(
        [(2, 21.0, "B"), (3, 30.0, "C"), (4, 40.0, "D"), (5, 50.0, "E")],
        "k INT, price DOUBLE, st STRING",
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in table_diff(v1, v2, "k", ["price", "st"]).collect()
    }
    assert got == {
        1: ("removed", []),
        2: ("changed", ["price"]),
        4: ("changed", ["price"]),  # NULL -> 40.0 is a change
        5: ("added", []),
    }  # row 3 unchanged: dropped


def test_table_diff_null_to_null_is_unchanged(spark):
    v1 = spark.createDataFrame([(1, None)], "k INT, price DOUBLE")
    v2 = spark.createDataFrame([(1, None)], "k INT, price DOUBLE")
    assert table_diff(v1, v2, "k", ["price"]).count() == 0


def test_entity_match_blocked_pairs(spark):
    recs = spark.createDataFrame(
        [
            (1, "smith", 10),
            (2, "smyth", 10),   # distance 1, same block
            (3, "smith", 20),   # same name, different block: no pair
            (4, "jones", 10),   # distance > 2 from smith/smyth
        ],
        "id INT, name STRING, blk INT",
    )
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in entity_match_candidates(recs, "id", "name", "blk", 2).collect()
    }
    assert got == {(1, 2): 1}


def test_triangle_count_known_graphs(spark):
    # K4: 4 triangles, 6 edges, 4 nodes
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "src INT, dst INT")
    row = triangle_count(df).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 6, 4)

    # path graph: no triangles; duplicate/reversed edges must dedupe
    path = [(0, 1), (1, 0), (1, 2), (2, 3), (2, 3)]
    row = triangle_count(spark.createDataFrame(path, "src INT, dst INT")).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 3, 0)

    # hub + one closing edge: exactly one triangle regardless of hub degree
    hub = [(0, i) for i in range(1, 8)] + [(1, 2)]
    row = triangle_count(spark.createDataFrame(hub, "src INT, dst INT")).collect()[0]
    assert row["n_triangles"] == 1


def test_transition_matrix_probabilities(spark):
    from meerpipe_spark.operators.funnel import transition_matrix

    rows = [
        # user 1: a -> b -> a ; user 2: a -> c
        (1, 1, "a", "2024-01-01 00:00:00"),
        (2, 1, "b", "2024-01-01 00:01:00"),
        (3, 1, "a", "2024-01-01 00:02:00"),
        (4, 2, "a", "2024-01-01 00:00:00"),
        (5, 2, "c", "2024-01-01 00:01:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id INT, user_id INT, event_type STRING, ts STRING"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["src_type"], r["dst_type"]): (r["n"], r["p"])
        for r in transition_matrix(ev).collect()
    }
    assert got == {("a", "b"): (1, 0.5), ("a", "c"): (1, 0.5), ("b", "a"): (1, 1.0)}


def test_skew_profile_gini(spark):
    from meerpipe_spark.skew import skew_profile

    # counts: x->4, y->2, z->2  (ascending ranks: y=1? tie-break by key:
    # asc order (cnt, key): (2,'y')=1, (2,'z')=2, (4,'x')=3
    # rc = 1*2 + 2*2 + 3*4 = 18; tot=8; n=3
    # gini = 2*18/(3*8) - 4/3 = 1.5 - 1.333333... = 0.166667
    rows = [(k,) for k in ["x"] * 4 + ["y"] * 2 + ["z"] * 2]
    df = spark.createDataFrame(rows, "k STRING")
    out = skew_profile(df, F.col("k"), top=2).orderBy("rank").collect()
    assert [r["key"] for r in out] == ["x", "y"]
    assert out[0]["share"] == 0.5
    assert out[0]["cum_share"] == 0.5
    assert out[1]["cum_share"] == 0.75
    assert abs(out[0]["gini"] - 0.166667) < 1e-9


def test_nb_langid_separable_corpus(spark):
    from meerpipe_spark.operators.text import nb_langid_confusion

    # perfectly separable vocabularies -> diagonal confusion matrix
    rows = [
        (1, "bonjour le monde", "fr"),
        (2, "le monde bonjour bonjour", "fr"),
        (3, "hello world hello", "en"),
        (4, "world hello world", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING, lang STRING")
    got = {
        (r["lang"], r["pred_lang"]): r["n"]
        for r in nb_langid_confusion(docs).collect()
    }
    assert got == {("fr", "fr"): 2, ("en", "en"): 2}


def test_entity_match_deletion_join_exact_vs_naive(spark):
    from meerpipe_spark.operators.reconcile import (
        entity_match_candidates,
        entity_match_deletion_join,
    )

    # substitutions, a deletion (indel), and a far pair — the deletion
    # join must reproduce the naive quadratic join's lev<=1 pairs exactly
    rows = [
        (1, "smith"), (2, "smyth"),      # substitution
        (3, "smit"),                     # deletion of 'h' vs 1
        (4, "jones"), (5, "jones"),      # identical (distance 0)
        (6, "zzzzz"),
    ]
    recs = spark.createDataFrame(rows, "id INT, name STRING")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in entity_match_deletion_join(recs, "id", "name").collect()
    }
    naive = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in entity_match_candidates(
            recs.withColumn("blk", recs.id * 0), "id", "name", "blk", 1
        ).collect()
    }
    assert got == naive
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(4, 5)] == 0
    assert (2, 3) not in got  # smyth vs smit is distance 2


def test_new_operators_handle_empty_inputs(spark):
    """Graceful empties: a 100 TB pipeline's first production incident
    is an empty partition hitting an operator that assumed rows."""
    from pyspark.sql import functions as F

    from meerpipe_spark.operators.bpe import bpe_train
    from meerpipe_spark.operators.graph import k_core, label_propagation, triangle_count
    from meerpipe_spark.operators.reconcile import entity_match_deletion_join, table_diff
    from meerpipe_spark.skew import skew_profile

    empty_docs = spark.createDataFrame([], "doc_id INT, text STRING")
    assert bpe_train(empty_docs, steps=3).count() == 0

    empty_edges = spark.createDataFrame([], "src INT, dst INT")
    row = triangle_count(empty_edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (0, 0, 0)
    assert label_propagation(empty_edges, iters=2).count() == 0
    assert k_core(empty_edges, k=2, rounds=2).count() == 0

    empty_recs = spark.createDataFrame([], "id INT, name STRING")
    assert entity_match_deletion_join(empty_recs, "id", "name").count() == 0

    e = spark.createDataFrame([], "k INT, v DOUBLE")
    assert table_diff(e, e, "k", ["v"]).count() == 0

    assert skew_profile(spark.createDataFrame([], "k STRING"), F.col("k")).count() == 0
