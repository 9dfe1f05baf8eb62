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
