"""Sequence-packing invariants: exact assignment, budget respected,
oversized docs isolated, determinism, and fill quality vs the trivial
one-doc-per-pack baseline."""

from __future__ import annotations

import random

from pyspark.sql import Row

from meerpipe_spark.operators.packing import pack_sequences, pack_stats

BUDGET = 1000


def _docs(spark, lengths):
    return spark.createDataFrame(
        [Row(doc_id=i, n_tokens=n) for i, n in enumerate(lengths)]
    )


def _lengths(n=500, seed=3):
    rng = random.Random(seed)
    return [rng.randrange(20, 600) for _ in range(n)]


def test_every_doc_packed_once_and_budget_held(spark):
    docs = _docs(spark, _lengths())
    packed = pack_sequences(docs, BUDGET, num_groups=8).collect()
    assert sorted(r.doc_id for r in packed) == list(range(500))
    by_pack: dict[int, int] = {}
    for r in packed:
        by_pack[r.pack_id] = by_pack.get(r.pack_id, 0) + r.n_tokens
    assert all(tot <= BUDGET for tot in by_pack.values())


def test_oversized_doc_gets_singleton_pack(spark):
    docs = _docs(spark, [1500, 100, 200])
    packed = pack_sequences(docs, BUDGET, num_groups=1).collect()
    packs = {}
    for r in packed:
        packs.setdefault(r.pack_id, []).append(r.doc_id)
    big_pack = [m for m in packs.values() if 0 in m]
    assert big_pack == [[0]]  # the 1500-token doc is alone


def test_deterministic_across_runs(spark):
    docs = _docs(spark, _lengths())
    a = sorted(map(tuple, pack_sequences(docs, BUDGET, num_groups=8).collect()))
    b = sorted(map(tuple, pack_sequences(docs, BUDGET, num_groups=8).collect()))
    assert a == b


def test_fill_quality_beats_naive(spark):
    """FFD within shards should land well above the ~31% average fill of
    one-doc-per-pack for these lengths."""
    docs = _docs(spark, _lengths())
    packed = pack_sequences(docs, BUDGET, num_groups=4)
    stats = pack_stats(packed, BUDGET).collect()
    n_packs = len(stats)
    total = sum(r.pack_tokens for r in stats)
    assert n_packs < 500 * 0.45  # far fewer packs than docs
    assert total / (n_packs * BUDGET) > 0.8  # mean fill > 80%


def test_null_token_counts_pack_as_zero(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, n_tokens=None), Row(doc_id=1, n_tokens=500)]
    )
    packed = pack_sequences(docs, BUDGET, num_groups=1).collect()
    assert sorted(r.doc_id for r in packed) == [0, 1]
    assert {r.doc_id: r.n_tokens for r in packed}[0] == 0


def test_md5_shard_lane_same_invariants(spark):
    """The oracle-reproducible md5 shard lane holds the same packing
    invariants as the xxhash64 production lane: exact assignment and
    budget per pack."""
    from pyspark.sql import Row

    from meerpipe_spark.operators.packing import pack_sequences

    rows = [Row(doc_id=i, n_tokens=(i * 37) % 300 + 1) for i in range(200)]
    docs = spark.createDataFrame(rows)
    packed = pack_sequences(docs, budget=256, num_groups=8, shard_hash="md5")
    out = packed.collect()
    assert len(out) == 200 and len({r.doc_id for r in out}) == 200
    import collections

    per_pack = collections.defaultdict(list)
    for r in out:
        per_pack[r.pack_id].append(r.n_tokens)
    for toks in per_pack.values():
        # budget holds except for singleton oversized docs
        assert sum(toks) <= 256 or (len(toks) == 1 and toks[0] > 256)
