"""KMV distinct-count sketch and bigram-LM scoring: exactness below k,
bounded estimation error above k, mergeability of the minima, and the
LM score's common-vs-rare ordering."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.sketches import bigram_lm_score, kmv_distinct


def _vals(spark, rows):
    return spark.createDataFrame([Row(g=g, v=v) for g, v in rows])


def test_kmv_exact_below_k(spark):
    df = _vals(spark, [("a", f"v{i}") for i in range(10)] * 3)  # 30 rows, 10 distinct
    out = kmv_distinct(df, ["g"], "v", k=64).head()
    assert out.n_seen == 30
    assert out.n_minima == 10
    assert out.kmv_est == 10.0  # sketch IS the value set below k


def test_kmv_estimate_within_error_bound(spark):
    n = 2000
    df = _vals(spark, [("a", f"value-{i}") for i in range(n)])
    k = 64
    out = kmv_distinct(df, ["g"], "v", k=k).head()
    assert out.n_minima == k
    # SE ~ n/sqrt(k-2); allow 5 sigma — deterministic, so this either
    # always passes or the estimator is wrong.
    assert abs(out.kmv_est - n) < 5 * n / math.sqrt(k - 2)


def test_kmv_minima_merge_property(spark):
    # min-k of the union == min-k of merged per-part min-k sets
    all_rows = [("a", f"x{i}") for i in range(500)]
    whole = kmv_distinct(_vals(spark, all_rows), ["g"], "v", k=32).head().minima
    h1 = kmv_distinct(_vals(spark, all_rows[:250]), ["g"], "v", k=32).head().minima
    h2 = kmv_distinct(_vals(spark, all_rows[250:]), ["g"], "v", k=32).head().minima
    merged = sorted(set(h1) | set(h2))[:32]
    assert list(whole) == merged


def test_kmv_partitioning_independent(spark):
    rows = [("a", f"t{i % 300}") for i in range(900)]
    a = kmv_distinct(_vals(spark, rows), ["g"], "v", k=16).head()
    b = kmv_distinct(_vals(spark, rows).repartition(7), ["g"], "v", k=16).head()
    assert a.kmv_est == b.kmv_est and list(a.minima) == list(b.minima)


def test_bigram_lm_score_orders_common_above_rare(spark):
    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=common) for i in range(5)]
        + [Row(doc_id=99, text="zq xv qk jw vn pz")]  # bigrams seen once
    )
    out = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    assert out[0].lm_score > out[99].lm_score
    assert out[99].lm_score == 0.0  # log10(1) everywhere
    assert out[0].n_bigrams == 5


def test_bigram_lm_score_single_word_doc_dropped(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="solo"), Row(doc_id=2, text="a b")]
    )
    out = bigram_lm_score(docs)
    assert [r.doc_id for r in out.collect()] == [2]  # no bigrams -> no row


def test_kmv_pairwise_resemblance_bounds(spark):
    """Identical sets estimate J=1, disjoint sets J=0, and a half-
    overlapping pair lands strictly between."""
    from pyspark.sql import Row, functions as F

    from meerpipe_spark.operators.sketches import kmv_distinct, kmv_pairwise_resemblance

    rows = []
    for i in range(200):
        rows.append(Row(g="a", v=f"x{i}"))
        rows.append(Row(g="b", v=f"x{i}"))          # b == a
        rows.append(Row(g="c", v=f"y{i}"))          # c disjoint
        rows.append(Row(g="d", v=f"x{i}" if i < 100 else f"z{i}"))  # half of a
    sk = kmv_distinct(spark.createDataFrame(rows), ["g"], "v", k=64)
    est = {
        (r.group_a, r.group_b): r.jaccard_est
        for r in kmv_pairwise_resemblance(sk, "g", k=64).collect()
    }
    assert est[("a", "b")] == 1.0
    assert est[("a", "c")] == 0.0
    assert 0.0 < est[("a", "d")] < 1.0  # true J = 100/300 ~ 0.33
    assert abs(est[("a", "d")] - 1 / 3) < 0.15  # within ~2 SE of truth


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog (round 5)
# ---------------------------------------------------------------------------

def test_hll_estimate_within_error_bound(spark):
    from meerpipe_spark.operators.sketches import hll_distinct

    n = 5000
    df = _vals(spark, [("a", f"value-{i}") for i in range(n)])
    out = hll_distinct(df, ["g"], "v").head()
    # SE = 1.04/sqrt(1024) ~ 3.3%; 5 sigma. Deterministic: passes
    # always or the estimator is wrong.
    assert abs(out.hll_est - n) < 5 * 0.033 * n


def test_hll_small_range_linear_counting(spark):
    from meerpipe_spark.operators.sketches import hll_distinct

    # 50 distinct values: far below 2.5*m, so the linear-counting branch
    # fires; with n << m it is near-exact.
    df = _vals(spark, [("a", f"v{i}") for i in range(50)] * 4)
    out = hll_distinct(df, ["g"], "v").head()
    assert out.n_registers <= 50
    assert abs(out.hll_est - 50) < 5


def test_hll_partitioning_invariant(spark):
    from meerpipe_spark.operators.sketches import hll_distinct

    rows = [("a", f"doc-{i}") for i in range(1200)]
    one = hll_distinct(_vals(spark, rows).coalesce(1), ["g"], "v").head()
    many = hll_distinct(_vals(spark, rows).repartition(17), ["g"], "v").head()
    # max-registers + integer harmonic sum: bit-identical on any layout
    assert one.hll_est == many.hll_est
    assert one.n_registers == many.n_registers


def test_hll_duplicates_do_not_move_estimate(spark):
    from meerpipe_spark.operators.sketches import hll_distinct

    base = [("a", f"v{i}") for i in range(800)]
    once = hll_distinct(_vals(spark, base), ["g"], "v").head()
    thrice = hll_distinct(_vals(spark, base * 3), ["g"], "v").head()
    assert once.hll_est == thrice.hll_est


# ---------------------------------------------------------------------------
# Deterministic Bloom filter (round 5)
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives(spark):
    from meerpipe_spark.operators.sketches import bloom_bitset, bloom_might_contain

    members = _vals(spark, [("m", f"key-{i}") for i in range(300)])
    bits = bloom_bitset(members, "v", m_bits=2048, k=4)
    probed = bloom_might_contain(members, "v", bits, m_bits=2048, k=4)
    assert probed.filter(~F.col("bloom_hit")).count() == 0  # structural guarantee


def test_bloom_false_positive_rate_bounded(spark):
    from meerpipe_spark.operators.sketches import bloom_bitset, bloom_might_contain

    members = _vals(spark, [("m", f"key-{i}") for i in range(300)])
    others = _vals(spark, [("o", f"other-{i}") for i in range(2000)])
    bits = bloom_bitset(members, "v", m_bits=2048, k=4)
    fp = bloom_might_contain(others, "v", bits, m_bits=2048, k=4).filter(
        F.col("bloom_hit")
    ).count()
    # load 300*4/2048 -> theoretical FP ~ (1-exp(-600/1024))^4 ~ 4.8%;
    # allow 3x headroom (deterministic: fixed outcome for fixed keys)
    assert fp / 2000 < 0.15


def test_bloom_word_fold_matches_position_list(spark):
    """r13 optimization: the probe folds the sorted position list into
    bitmap words and tests bits with element_at + bitwiseAND instead of
    forall/array_contains (CodegenFallback + linear scan).  The word
    path must make the identical membership decision: bloom_hit ==
    every bloom_positions(key) present in the bloom_bits list."""
    from meerpipe_spark.operators.sketches import (
        bloom_bitset,
        bloom_might_contain,
        bloom_positions,
    )

    members = _vals(spark, [("m", f"key-{i}") for i in range(300)])
    probes = _vals(
        spark,
        [("m", f"key-{i}") for i in range(0, 300, 7)]
        + [("o", f"other-{i}") for i in range(500)],
    )
    bits = bloom_bitset(members, "v", m_bits=2048, k=4)
    got = bloom_might_contain(probes, "v", bits, m_bits=2048, k=4)
    ref = probes.crossJoin(F.broadcast(bits)).select(
        "v",
        F.forall(
            bloom_positions(F.col("v"), 2048, 4),
            lambda p: F.array_contains(F.col("bloom_bits"), p),
        ).alias("ref_hit"),
    )
    diff = got.join(ref, "v").filter(F.col("bloom_hit") != F.col("ref_hit"))
    assert diff.count() == 0


def test_bloom_bitset_is_broadcast_sized(spark):
    from meerpipe_spark.operators.sketches import bloom_bitset

    members = _vals(spark, [("m", f"key-{i}") for i in range(5000)])
    row = bloom_bitset(members, "v", m_bits=2048, k=4).head()
    assert len(row.bloom_bits) <= 2048
    assert row.bloom_bits == sorted(set(row.bloom_bits))


# ---------------------------------------------------------------------------
# Deterministic-sample quantiles (round 5)
# ---------------------------------------------------------------------------

def test_sampled_quantiles_tracks_exact(spark):
    from pyspark.sql import Row
    from meerpipe_spark.operators.sketches import sampled_quantiles

    rows = [Row(g="a", k=i, v=float(i)) for i in range(4000)]
    out = sampled_quantiles(
        spark.createDataFrame(rows), ["g"], "v", key_cols=["k"]
    ).head()
    assert out.n_rows == 4000
    # rate 16/256 -> ~250 sampled; DKW: quantile rank error ~1/sqrt(m)
    assert 150 < out.n_sampled < 400
    assert abs(out.q50_sampled - 2000) < 4000 * 0.15
    assert out.q25_sampled < out.q50_sampled < out.q75_sampled


def test_sampled_quantiles_deterministic(spark):
    from pyspark.sql import Row
    from meerpipe_spark.operators.sketches import sampled_quantiles

    rows = [Row(g="a", k=i, v=float(i * 7 % 1000)) for i in range(2000)]
    a = sampled_quantiles(spark.createDataFrame(rows).coalesce(1), ["g"], "v", ["k"]).head()
    b = sampled_quantiles(spark.createDataFrame(rows).repartition(9), ["g"], "v", ["k"]).head()
    assert a == b


# --- Count-Min sketch -------------------------------------------------------

def _cms_stream(spark, counts: dict):
    rows = [Row(v=k) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows)


def test_cms_estimates_are_one_sided(spark):
    from meerpipe_spark.operators.sketches import cms_build, cms_probe

    counts = {f"item-{i}": (i % 7) + 1 for i in range(300)}
    df = _cms_stream(spark, counts)
    sketch = cms_build(df, "v")
    probes = spark.createDataFrame([Row(v=k) for k in counts])
    est = {r["v"]: r["cms_est"] for r in cms_probe(sketch, probes, "v").collect()}
    n = sum(counts.values())
    for k, true in counts.items():
        assert est[k] >= true, k  # collisions only ADD
        # CMS guarantee: est ≤ true + ε·N with prob 1-δ; assert the
        # deterministic outcome for THIS fixed hash family
        assert est[k] <= true + n


def test_cms_merge_is_cellwise_sum(spark):
    from meerpipe_spark.operators.sketches import cms_build

    counts = {f"tok{i}": i + 1 for i in range(50)}
    df = _cms_stream(spark, counts)
    cond = F.substring(F.md5("v"), 1, 1) < F.lit("8")
    half1 = df.filter(cond)
    half2 = df.filter(~cond)
    merged = (
        cms_build(half1, "v").unionByName(cms_build(half2, "v"))
        .groupBy("j", "bucket").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    whole = cms_build(df, "v")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_partitioning_invariance(spark):
    from meerpipe_spark.operators.sketches import cms_build

    counts = {f"w{i}": 3 for i in range(100)}
    df = _cms_stream(spark, counts)
    a = sorted(map(tuple, cms_build(df.repartition(1), "v").collect()))
    b = sorted(map(tuple, cms_build(df.repartition(17), "v").collect()))
    assert a == b


def test_bootstrap_ci_brackets_true_mean_and_shrinks(spark):
    from pyspark.sql import Row
    from meerpipe_spark.operators.sketches import bootstrap_ci_mean

    rows = [Row(g="a", k=i, v=float(50 + (i * 37) % 21 - 10)) for i in range(2000)]
    df = spark.createDataFrame(rows)
    out = bootstrap_ci_mean(df, ["g"], "v", "k").head()
    assert out.ci_lo <= out.mean <= out.ci_hi
    # uniform-ish on [40,60]: sd≈6 -> CI half-width ≈ 2*6/sqrt(2000) ≈ 0.27
    assert (out.ci_hi - out.ci_lo) < 1.0
    small = bootstrap_ci_mean(df.limit(100), ["g"], "v", "k").head()
    assert (small.ci_hi - small.ci_lo) > (out.ci_hi - out.ci_lo)  # n↓ ⇒ wider


def test_bootstrap_ci_partitioning_invariant(spark):
    from pyspark.sql import Row
    from meerpipe_spark.operators.sketches import bootstrap_ci_mean

    rows = [Row(g="a", k=i, v=float(i % 13)) for i in range(500)]
    df = spark.createDataFrame(rows)
    a = bootstrap_ci_mean(df.repartition(1), ["g"], "v", "k").head()
    b = bootstrap_ci_mean(df.repartition(17), ["g"], "v", "k").head()
    assert (a.mean, a.ci_lo, a.ci_hi) == (b.mean, b.ci_lo, b.ci_hi)
