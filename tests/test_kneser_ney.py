"""Kneser–Ney bigram LM: exact normalization (the model is a proper
conditional distribution once the unseen-continuation mass is summed
in), backoff-chain behavior on held-out data, and the OOV floor."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from meerpipe_spark.operators.text import (
    kneser_ney_bigram,
    kneser_ney_heldout_ppl,
)

D = 0.75


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_kn_tables(texts):
    c2: Counter = Counter()
    for t in texts:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
    c1: Counter = Counter()
    nf: Counter = Counter()
    nb: Counter = Counter()
    for (a, b), c in c2.items():
        c1[a] += c
        nf[a] += 1
        nb[b] += 1
    return c2, c1, nf, nb, len(c2)


def test_kn_normalizes_to_one(spark):
    """For every history w1: Σ over the FULL continuation vocabulary of
    P_KN(w2|w1) = 1 exactly — seen bigrams carry max(c2−D,0)/c1, and the
    discount mass D·nf/c1 times Σ Pcont = 1 restores the rest."""
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog and a bird",
        "the bird sat on the cat",
    ]
    model = {
        (r["w1"], r["w2"]): r["p_kn"]
        for r in kneser_ney_bigram(_docs(spark, texts)).collect()
    }
    c2, c1, nf, nb, B = _py_kn_tables(texts)
    vocab = set(nb)  # continuation vocabulary
    for w1 in c1:
        total = 0.0
        lam = D * nf[w1] / c1[w1]
        for w2 in vocab:
            if (w1, w2) in model:
                total += model[(w1, w2)]
            else:
                total += lam * (nb[w2] / B)
        assert total == pytest.approx(1.0, abs=5e-6), w1


def test_kn_continuation_beats_raw_frequency(spark):
    """The KN signature: a word frequent ONLY after one fixed history
    ('francisco' after 'san') gets a LOWER continuation share than a
    rarer word seen after many histories."""
    texts = ["san francisco " * 6 + "san francisco", "a b", "c b", "d b", "e b"]
    rows = kneser_ney_bigram(_docs(spark, texts)).collect()
    by_w2 = {(r["w1"], r["w2"]): r for r in rows}
    nb_francisco = by_w2[("san", "francisco")]["nb"]
    nb_b = by_w2[("a", "b")]["nb"]
    assert nb_francisco == 1 and nb_b == 4
    # raw counts point the other way
    assert by_w2[("san", "francisco")]["c2"] > by_w2[("a", "b")]["c2"]


def test_heldout_backoff_chain(spark):
    """Seen-history/seen-bigram, seen-history/unseen-bigram,
    unseen-history, and OOV all score finite; OOV hits the floor."""
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b", True),
            (1, "b c b c", True),
            (2, "a b c zz", False),  # seen bigram, unseen bigram (c zz), OOV zz
        ],
        "doc_id long, text string, is_train boolean",
    )
    out = kneser_ney_heldout_ppl(docs, F.col("is_train")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 2 and r["n_bigrams"] == 3
    assert math.isfinite(r["ppl"]) and r["ppl"] > 1.0
    # the OOV floor bounds the worst bigram at 12 digits: mean_logp >= -12
    assert r["mean_logp"] >= -12.0


def test_heldout_matches_python_model(spark):
    """End-to-end per-doc ppl equals an independent pure-Python KN
    scorer on the same split."""
    train = ["the cat sat on the mat", "the dog sat on the log", "a cat and a dog"]
    test = ["the cat sat on the log", "a dog and the cat"]
    docs = spark.createDataFrame(
        [(i, t, True) for i, t in enumerate(train)]
        + [(100 + i, t, False) for i, t in enumerate(test)],
        "doc_id long, text string, is_train boolean",
    )
    got = {
        r["doc_id"]: r
        for r in kneser_ney_heldout_ppl(docs, F.col("is_train")).collect()
    }
    c2, c1, nf, nb, B = _py_kn_tables(train)
    for i, t in enumerate(test):
        ws = t.split(" ")
        logs = []
        for a, b in zip(ws, ws[1:]):
            if a in c1:
                p = max(c2.get((a, b), 0) - D, 0.0) / c1[a] + (
                    D * nf[a] / c1[a]
                ) * (nb.get(b, 0) / B)
            else:
                p = nb.get(b, 0) / B
            logs.append(math.log10(max(p, 1e-12)))
        mean = math.floor(sum(logs) / len(logs) * 1e6 + 0.5) / 1e6
        want = math.floor(10.0 ** (-mean) * 1e4 + 0.5) / 1e4
        assert got[100 + i]["ppl"] == pytest.approx(want, abs=1e-9)
        assert got[100 + i]["n_bigrams"] == len(ws) - 1
