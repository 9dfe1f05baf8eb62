"""Misra–Gries frequent-items: the union guarantee (candidates ⊇ every
item above support 1/k, for ANY batching), the bounded-counter
invariant, and end-to-end exactness on Spark under forced
multi-partition / skewed inputs."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from meerpipe_spark.operators.frequent import _mg_partition, heavy_hitters


def _run_mg(batches: list[list[str]], k: int) -> pd.DataFrame:
    frames = (pd.DataFrame({"token": b}) for b in batches)
    (out,) = list(_mg_partition(iter(frames), k))
    return out


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=120), min_size=0, max_size=80),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_mg_guarantee_and_bound(batches, k):
    """Survival guarantee: every token with count > n/(k+1) is in the
    summary; live counters never exceed k; the sentinel row carries the
    exact token count; surviving lower bounds never overcount."""
    toks = [[f"w{v}" for v in b] for b in batches]
    out = _run_mg(toks, k)
    sent = out[out["token"].isna()]
    cand = out[out["token"].notna()]
    n = sum(len(b) for b in toks)
    assert sent["lb"].tolist() == [n]
    assert len(cand) <= k
    exact = Counter(t for b in toks for t in b)
    for tok, c in exact.items():
        if c * (k + 1) > n:
            assert tok in set(cand["token"]), (tok, c, n, k)
    lb = dict(zip(cand["token"], cand["lb"]))
    for tok, v in lb.items():
        assert 0 < v <= exact[tok]


def test_mg_decay_path():
    """vocab ≫ k forces the batched decrement: counters stay ≤ k and the
    genuinely heavy token still survives with a positive lower bound."""
    stream = ["heavy"] * 400 + [f"rare{i}" for i in range(300)]
    out = _run_mg([stream[i : i + 50] for i in range(0, len(stream), 50)], k=8)
    cand = out[out["token"].notna()]
    assert len(cand) <= 8
    assert "heavy" in set(cand["token"])


def test_heavy_hitters_exact_on_skewed_multipartition(spark):
    """End-to-end on Spark: skewed vocab (1 hot key = 30%, 500 rare
    keys), vocab ≫ k, repartitioned 8 ways — the result equals the
    exact support-1/k answer computed independently."""
    rows = (
        [("hot",)] * 3000
        + [("warm1",)] * 2000
        + [("warm2",)] * 1500
        + [(f"cold{i % 500}",) for i in range(3500)]
    )
    k = 16
    df = spark.createDataFrame(rows, "token string").repartition(8)
    got = heavy_hitters(df, k=k).collect()
    exact = Counter(t for (t,) in rows)
    n = sum(exact.values())
    want = sorted(
        ((t, c) for t, c in exact.items() if c * k > n),
        key=lambda tc: (-tc[1], tc[0]),
    )
    assert [(r["token"], r["cnt"]) for r in got] == want
    assert all(r["n_tokens"] == n for r in got)
    assert pytest.approx(got[0]["share"], abs=1e-6) == exact["hot"] / n


def test_heavy_hitters_empty_and_all_light(spark):
    """No token above support → empty result (not an error); empty
    input → empty result."""
    df = spark.createDataFrame(
        [(f"w{i}",) for i in range(200)], "token string"
    ).repartition(4)
    assert heavy_hitters(df, k=16).count() == 0
    empty = spark.createDataFrame([], "token string")
    assert heavy_hitters(empty, k=16).count() == 0


def test_mg_merge_is_mergeable_summary(spark):
    """Agarwal et al. mergeability: merging per-split MG summaries of an
    arbitrary split gives a valid MG summary of the union — every token
    with global count > N/(k+1) survives, and lb is a true lower bound
    within N/(k+1)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from meerpipe_spark.operators.frequent import mg_merge, mg_summaries

    k = 4
    words = (
        ["hot"] * 60 + ["warm"] * 25 + ["mild"] * 12
        + [f"rare{i}" for i in range(40)]
    )
    import random

    rng = random.Random(7)
    rng.shuffle(words)
    half = len(words) // 2
    df1 = spark.createDataFrame([(w,) for w in words[:half]], "token string")
    df2 = spark.createDataFrame([(w,) for w in words[half:]], "token string")
    s1 = mg_summaries(df1.coalesce(1), k=k)
    s2 = mg_summaries(df2.coalesce(2), k=k)
    merged = mg_merge(s1.unionByName(s2), k=k)
    rows = merged.collect()
    cand = {r.token: r.lb for r in rows if r.token is not None}
    n_total = [r.lb for r in rows if r.token is None][0]
    true = Counter(words)
    assert n_total == len(words)
    assert len(cand) <= k
    for tok, c in true.items():
        if c > len(words) / (k + 1):
            assert tok in cand, tok
    for tok, lb in cand.items():
        assert lb <= true[tok]
        assert true[tok] - lb <= len(words) / (k + 1) + 1e-9
    # merges COMPOSE: the merged summary is a valid mg_merge input
    again = mg_merge(merged, k=k).collect()
    assert {r.token for r in again if r.token is not None} <= set(cand) | {None}
    assert [r.lb for r in again if r.token is None][0] == len(words)


def test_streaming_heavy_hitters_bounded_state(spark, tmp_path):
    """Streaming MG: each micro-batch's per-partition summaries merge
    into a persistent candidate table via foreachBatch — bounded state
    (≤ k candidates + sentinel) at any stream length, redelivery-safe
    via a processed-batch ledger, and the final candidates cover every
    true global heavy hitter of the delivered stream."""
    import json
    import os
    from collections import Counter

    from pyspark.sql import functions as F

    from meerpipe_spark.operators.frequent import mg_merge, mg_summaries

    k = 8
    words1 = ["alpha"] * 50 + ["beta"] * 30 + [f"x{i}" for i in range(30)]
    words2 = ["alpha"] * 40 + ["gamma"] * 35 + [f"y{i}" for i in range(30)]
    src = str(tmp_path / "tok_stream")
    spark.createDataFrame([(w,) for w in words1], "token string").coalesce(1).write.parquet(src)
    spark.createDataFrame([(w,) for w in words2], "token string").coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "mg_store")
    seen_path = str(tmp_path / "mg_batches.json")

    def process(batch, batch_id):
        seen = set(json.load(open(seen_path))) if os.path.exists(seen_path) else set()
        if batch_id in seen:
            return  # redelivered micro-batch: state already merged
        s = batch.sparkSession
        new = mg_summaries(batch, k=k)
        try:
            acc = s.read.parquet(store)
            merged = mg_merge(acc.unionByName(new), k=k)
        except Exception:
            merged = mg_merge(new, k=k)
        rows = merged.collect()  # ≤ k+1 rows: bounded by construction
        s.createDataFrame(rows, "token string, lb long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(store)
        json.dump(sorted(seen | {batch_id}), open(seen_path, "w"))

    def run(ckpt):
        q = (
            spark.readStream.schema("token string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
    rows = spark.read.parquet(store).collect()
    assert len(rows) <= k + 1
    cand = {r.token: r.lb for r in rows if r.token is not None}
    n_total = [r.lb for r in rows if r.token is None][0]
    all_words = words1 + words2
    true = Counter(all_words)
    assert n_total == len(all_words)
    for tok, c in true.items():
        if c > len(all_words) / (k + 1):
            assert tok in cand, tok
    for tok, lb in cand.items():
        assert lb <= true[tok]
    # full redelivery (fresh checkpoint): the batch ledger suppresses
    # every merge — state unchanged
    before = sorted((r.token or "", r.lb) for r in rows)
    run(str(tmp_path / "ck2"))
    after = sorted((r.token or "", r.lb) for r in spark.read.parquet(store).collect())
    assert after == before
