"""BPE merge training/encoding vs hand-computed classic examples."""

from __future__ import annotations

from meerpipe_spark.operators.bpe import bpe_encode, bpe_train, word_counts


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )


def test_word_counts(spark):
    wc = {
        r["word"]: (r["cnt"], r["syms"])
        for r in word_counts(_docs(spark, ["ab ab  cd", "ab"])).collect()
    }
    assert wc == {"ab": (3, ["a", "b"]), "cd": (1, ["c", "d"])}


def test_bpe_train_classic_corpus(spark):
    # Sennrich-style toy corpus: low x5, lower x2, newest x6, widest x3
    texts = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = _docs(spark, [" ".join(texts)])
    merges = [
        (r["step"], r["pair_a"], r["pair_b"], r["pair_count"])
        for r in bpe_train(docs, steps=4).orderBy("step").collect()
    ]
    # hand-derived: es(9) -> est(9) -> lo(7) -> low(7)
    assert merges == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_bpe_train_tie_breaks_lexicographically(spark):
    # "ab" and "ba" pairs tie at 2 each inside "abab"; (a,b) wins the
    # (count DESC, a ASC, b ASC) order
    docs = _docs(spark, ["abab abab"])
    first = bpe_train(docs, steps=1).collect()[0]
    assert (first["pair_a"], first["pair_b"]) == ("a", "b")


def test_bpe_merge_is_left_to_right_non_overlapping(spark):
    # 'aaa' with merge (a,a) must become [aa, a], never [a, aa] or [aaa]
    docs = _docs(spark, ["aaa aaa"])
    enc = bpe_encode(docs, [("a", "a")])
    toks = enc.select("tokens").collect()
    assert all(r["tokens"] == ["aa", "a"] for r in toks)


def test_bpe_encode_replays_training_merges(spark):
    texts = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = _docs(spark, [" ".join(texts)])
    merges = [
        (r["pair_a"], r["pair_b"])
        for r in bpe_train(docs, steps=4).orderBy("step").collect()
    ]
    enc = {
        r["word"]: r["tokens"]
        for r in bpe_encode(docs, merges).dropDuplicates(["word"]).collect()
    }
    assert enc["lowest"] if "lowest" in enc else True
    assert enc["low"] == ["low"]
    assert enc["lower"] == ["low", "e", "r"]
    assert enc["newest"] == ["n", "e", "w", "est"]
    assert enc["widest"] == ["w", "i", "d", "est"]


def test_bpe_encode_zero_shuffle(spark):
    docs = _docs(spark, ["ab ba", "ab"])
    enc = bpe_encode(docs, [("a", "b")])
    plan = enc._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan
