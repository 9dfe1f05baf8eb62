"""Similarity/ANN operator tests: cosine math, LSH bucketing, IVF
k-means convergence on separable clusters."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F, types as T

from meerpipe_spark.operators.similarity import (
    cosine_similarity,
    cosine_topk,
    hyperplane_lsh_buckets,
    ivf_assign,
    kmeans_centroids,
)

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def clustered(spark):
    """3 well-separated clusters in 8-d."""
    rng = np.random.default_rng(77)
    centers = np.array(
        [[10, 0, 0, 0, 0, 0, 0, 0], [0, 10, 0, 0, 0, 0, 0, 0], [0, 0, 10, 0, 0, 0, 0, 0]],
        dtype=float,
    )
    rows = []
    for i in range(60):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.3, 8)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v], label=c))
    return spark.createDataFrame(rows, EMB_SCHEMA).cache()


def test_cosine_matches_numpy(spark, clustered):
    pdf = clustered.limit(10).toPandas()
    q = np.array(pdf.iloc[0]["embedding"], dtype=float)
    qcol = F.array(*[F.lit(float(x)) for x in q])
    cast = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    got = {
        r.vec_id: r.sim
        for r in clustered.limit(10)
        .select("vec_id", cosine_similarity(cast, qcol).alias("sim"))
        .collect()
    }
    for _, row in pdf.iterrows():
        v = np.array(row["embedding"], dtype=float)
        expect = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert got[row["vec_id"]] == pytest.approx(expect, rel=1e-6)


def test_cosine_topk_returns_self_first(spark, clustered):
    q = clustered.filter("vec_id = 0").head()["embedding"]
    top = cosine_topk(clustered, list(q), k=5).collect()
    assert top[0].vec_id == 0  # identical vector -> sim 1.0
    assert top[0].cosine_sim == pytest.approx(1.0, abs=1e-9)
    assert len(top) == 5


def test_kmeans_recovers_clusters(spark, clustered):
    cents = kmeans_centroids(clustered, k=3, iters=4)
    assigned = ivf_assign(clustered, cents)
    joined = assigned.join(clustered.select("vec_id", "label"), "vec_id").collect()
    # cluster ids are arbitrary; check purity: each kmeans cluster maps to
    # exactly one true label
    from collections import defaultdict

    members = defaultdict(set)
    for r in joined:
        members[r.cluster].add(r.label)
    assert len(members) == 3
    for labels in members.values():
        assert len(labels) == 1


def test_lsh_buckets_group_similar(spark, clustered):
    rng = np.random.default_rng(3)
    planes = rng.normal(size=(8, 8)).tolist()
    buckets = hyperplane_lsh_buckets(clustered, planes)
    joined = buckets.join(clustered.select("vec_id", "label"), "vec_id").collect()
    # same-cluster vectors (tight blobs) land in the same bucket
    from collections import defaultdict

    by_label = defaultdict(set)
    for r in joined:
        by_label[r.label].add(r.bucket)
    # a tight blob collapses to a handful of buckets (planes crossing the
    # blob split it), and the three blobs never share a bucket
    all_buckets = [bs for bs in by_label.values()]
    for label, bs in by_label.items():
        assert len(bs) <= 4, (label, bs)
    assert not (all_buckets[0] & all_buckets[1] & all_buckets[2])


def test_embedding_near_dup_exact_and_lsh_recall(spark):
    """Planted near-dup pairs: exact path finds them all; the LSH-bucketed
    path (8 hyperplanes) recovers the high-similarity pairs and is a
    subset of the exact result."""
    import numpy as np
    from pyspark.sql import Row

    from meerpipe_spark.operators.similarity import embedding_near_dup

    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        v = rng.normal(size=16)
        rows.append(Row(vec_id=2 * i, embedding=[float(x) for x in v]))
        near = v + rng.normal(scale=0.01, size=16)  # cosine ~0.9999
        rows.append(Row(vec_id=2 * i + 1, embedding=[float(x) for x in near]))
    emb = spark.createDataFrame(rows)
    exact = {(r.id_a, r.id_b) for r in embedding_near_dup(emb, threshold=0.99).collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    assert planted <= exact
    planes = [[float(x) for x in rng.normal(size=16)] for _ in range(8)]
    lsh = {(r.id_a, r.id_b) for r in embedding_near_dup(emb, threshold=0.99, planes=planes).collect()}
    assert lsh <= exact
    assert len(lsh & planted) >= 30  # >=75% recall on ~0.9999-sim pairs


def test_ivf_search_recall_vs_brute(spark):
    """Clustered data: IVF probe search recovers the brute-force top-k
    when the query's cluster is probed."""
    import numpy as np
    from pyspark.sql import Row, functions as F

    from meerpipe_spark.operators.similarity import cosine_topk, ivf_search, kmeans_centroids

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(4, 12)) * 5
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(50):
            v = centers[c] + rng.normal(size=12)
            rows.append(Row(vec_id=vid, embedding=[float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows)
    cents = kmeans_centroids(emb, k=4, iters=3)
    q = [float(x) for x in centers[2] + rng.normal(scale=0.1, size=12)]
    ivf = [r.vec_id for r in ivf_search(emb, cents, q, k=5, nprobe=1).collect()]
    brute = [r.vec_id for r in cosine_topk(emb, q, k=5).collect()]
    assert ivf == brute  # well-separated clusters: probe-1 is exact


def test_quantize_embeddings_exact_grid(spark):
    """Vectors on an exact [0, 255] grid quantize with zero error; the
    code sum equals the (scaled) coordinate sum."""
    from pyspark.sql import Row

    from meerpipe_spark.operators.similarity import quantize_embeddings

    rows = [
        Row(vec_id=0, embedding=[0.0, 0.0]),
        Row(vec_id=1, embedding=[255.0, 102.0]),
        Row(vec_id=2, embedding=[51.0, 255.0]),
    ]
    out = {
        r.vec_id: r
        for r in quantize_embeddings(spark.createDataFrame(rows), bits=8).collect()
    }
    # per-dim range is [0, 255] -> code == value exactly
    assert out[0].code_sum == 0 and out[0].rmse == 0.0
    assert out[1].code_sum == 357 and out[1].max_abs_err == 0.0
    assert out[2].code_sum == 306


def test_quantize_embeddings_error_bound(spark, clustered):
    """Reconstruction error is bounded by half a quantization step of
    the widest dimension."""
    import numpy as np

    from meerpipe_spark.operators.similarity import quantize_embeddings

    pdf = clustered.toPandas()
    mat = np.array([list(v) for v in pdf["embedding"]], dtype=float)
    step = (mat.max(axis=0) - mat.min(axis=0)).max() / 255.0
    out = quantize_embeddings(clustered, bits=8).collect()
    assert len(out) == 60
    for r in out:
        assert r.max_abs_err <= step / 2 + 1e-9


def test_ivf_search_multi_matches_single(spark, clustered):
    """Batch probe search returns, per query, exactly what the
    single-query form returns."""
    from pyspark.sql import functions as F

    from meerpipe_spark.operators.similarity import (
        ivf_search,
        ivf_search_multi,
        kmeans_centroids,
    )

    cents = kmeans_centroids(clustered, k=3, iters=3)
    qids = [0, 1, 2]
    qs = clustered.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    multi = ivf_search_multi(clustered, cents, qs, k=5, nprobe=1)
    got = {
        qid: [r.vec_id for r in rows]
        for qid, rows in (
            (q, sorted(multi.filter(F.col("qid") == q).collect(), key=lambda r: r.rank))
            for q in qids
        )
    }
    for q in qids:
        qv = [float(x) for x in clustered.filter(F.col("vec_id") == q).head()["embedding"]]
        single = [r.vec_id for r in ivf_search(clustered, cents, qv, k=5, nprobe=1).collect()]
        assert got[q] == single


def test_ann_recall_perfect_for_exact_input(spark, clustered):
    """Feeding the exact brute-force top-k back in scores recall 1.0;
    feeding a disjoint set scores 0.0."""
    from pyspark.sql import Row, functions as F

    from meerpipe_spark.operators.similarity import ann_recall, ivf_search_multi, kmeans_centroids

    cents = kmeans_centroids(clustered, k=3, iters=3)
    qs = clustered.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact_ann = ivf_search_multi(clustered, cents, qs, k=5, nprobe=3)  # all lists = exact
    r = ann_recall(clustered, exact_ann, qs, k=5).collect()
    assert len(r) == 1 and r[0].recall_at_k == 1.0 and r[0].n_hits == 5

    bogus = spark.createDataFrame([Row(qid=0, vec_id=-1 - i) for i in range(5)])
    r0 = ann_recall(clustered, bogus, qs, k=5).collect()
    assert r0[0].recall_at_k == 0.0


def test_semantic_dedup_removes_near_duplicate_keeps_min_id(spark, clustered):
    from pyspark.sql import Row

    from meerpipe_spark.operators.similarity import kmeans_centroids, semantic_dedup

    base = clustered.limit(60)
    v0 = list(base.filter(F.col("vec_id") == 0).head()["embedding"])
    dup = spark.createDataFrame(
        [Row(vec_id=999, embedding=[float(x) * 2.0 for x in v0], label=0)],
        base.schema,
    )
    emb = base.unionByName(dup)
    cents = kmeans_centroids(emb, k=3, iters=3)
    kept = {r.vec_id for r in semantic_dedup(emb, cents, threshold=0.999).collect()}
    # the scaled copy (cosine == 1 with vec 0) is removed; 0 survives
    assert 0 in kept and 999 not in kept and len(kept) == 60


def test_semantic_dedup_high_threshold_is_identity(spark, clustered):
    from meerpipe_spark.operators.similarity import kmeans_centroids, semantic_dedup

    cents = kmeans_centroids(clustered, k=3, iters=3)
    assert semantic_dedup(clustered, cents, threshold=1.0000001).count() == 60


def test_embedding_covariance_matches_numpy(spark, clustered):
    import numpy as np

    from meerpipe_spark.operators.similarity import embedding_covariance

    mat = np.array(
        [list(v) for v in clustered.toPandas()["embedding"]], dtype=float
    )
    expect = np.cov(mat, rowvar=False, bias=True)  # population
    got = embedding_covariance(clustered).collect()
    assert len(got) == 8 * 9 // 2
    for r in got:
        assert r.n == 60
        assert r.cov == pytest.approx(expect[r.i][r.j], abs=1e-9)


def test_semantic_dedup_hot_cluster_salted_pairs_bounded(spark):
    """VERDICT r3 #2: a degenerate cluster (every vector identical → all
    assigned to one centroid) must NOT go quadratic with the default
    guard. With cap=50 and 500 identical vectors, salting splits the
    cluster into ~10 cells, every cell still detects its internal dups
    (identical vectors are dups of any cluster-mate), so the survivor
    count equals the number of salt cells — bounded, not 1, proving the
    join ran per-cell. With the guard disabled the survivor count is
    exactly 1 (the global min id)."""
    from pyspark.sql import Row

    from meerpipe_spark.operators.similarity import semantic_dedup

    n, cap = 500, 50
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 0.0, 0.0]) for i in range(n)]
    )
    cents = spark.createDataFrame([Row(cluster=0, centroid=[1.0, 0.0, 0.0])])

    exact = semantic_dedup(emb, cents, threshold=0.99, max_cluster_size=None)
    assert exact.count() == 1  # one representative, min id
    assert exact.head().vec_id == 0

    guarded = semantic_dedup(emb, cents, threshold=0.99, max_cluster_size=cap)
    survivors = guarded.count()
    # one survivor per salt cell: ceil(500/50)=10 cells; every cell keeps
    # exactly its min-id member. Bounded ≪ n, and > 1 proves salting.
    assert 1 < survivors <= -(-n // cap)


def test_semantic_dedup_auto_guard_exact_on_healthy_clusters(spark, clustered):
    """auto == None on clusters under the cap: identical survivor sets."""
    from meerpipe_spark.operators.similarity import kmeans_centroids, semantic_dedup

    cents = kmeans_centroids(clustered, k=3, iters=3)
    auto = {r.vec_id for r in semantic_dedup(clustered, cents, threshold=0.97).collect()}
    exact = {
        r.vec_id
        for r in semantic_dedup(
            clustered, cents, threshold=0.97, max_cluster_size=None
        ).collect()
    }
    assert auto == exact


def test_semantic_dedup_autok_matches_explicit_below_resolve_bound(
    spark, clustered
):
    """centroids=None (the k ∝ n default, VERDICT r12 weak item) must
    reproduce the explicit literal path exactly while
    max(8, ceil(n/SEMDEDUP_TARGET_CLUSTER)) resolves to 8 — the bound
    inside which the lane's pinned k=8/iters=0 oracle stays valid."""
    from meerpipe_spark.operators.similarity import (
        SEMDEDUP_TARGET_CLUSTER,
        kmeans_centroids,
        semantic_dedup,
    )

    n = clustered.count()
    assert max(8, -(-n // SEMDEDUP_TARGET_CLUSTER)) == 8  # inside the bound
    auto = {
        r.vec_id for r in semantic_dedup(clustered, threshold=0.97).collect()
    }
    cents = kmeans_centroids(clustered, k=8, iters=0)
    explicit = {
        r.vec_id
        for r in semantic_dedup(clustered, cents, threshold=0.97).collect()
    }
    assert auto == explicit


def test_embedding_near_dup_lsh_hot_bucket_salted(spark):
    """A degenerate bucket (identical vectors all sharing one LSH
    bucket) must be salted under the default guard: with cap=50 and
    400 identical vectors, pairs are confined to salt cells, so the
    pair count is bounded by splits * C(cell,2) ≪ C(400,2); disabling
    the guard yields the full quadratic pair set."""
    from pyspark.sql import Row

    from meerpipe_spark.operators.similarity import embedding_near_dup

    n, cap = 400, 50
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 0.0, 0.0, 0.0]) for i in range(n)]
    )
    planes = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    exact = embedding_near_dup(emb, threshold=0.99, planes=planes, max_bucket_size=None)
    assert exact.count() == n * (n - 1) // 2

    guarded = embedding_near_dup(emb, threshold=0.99, planes=planes, max_bucket_size=cap)
    npairs = guarded.count()
    # md5 salt cells fluctuate around n/splits; allow 2x the even-split
    # pair bound — still ~8x below the unguarded quadratic
    splits = -(-n // cap)  # 8
    even_bound = splits * (n // splits) * (n // splits - 1) // 2
    assert 0 < npairs <= 2 * even_bound
    assert npairs < (n * (n - 1) // 2) // 4  # far below quadratic


def test_auto_plane_count_growth_law():
    from meerpipe_spark.operators.similarity import auto_plane_count

    # occupancy target 128: p grows with log2(n), floored at 4
    assert auto_plane_count(500) == 4
    assert auto_plane_count(2_000) == 4
    assert auto_plane_count(20_000) == 8
    assert auto_plane_count(2_000_000) == 14
    assert auto_plane_count(200_000_000) == 21
    # 100x corpus => ~log2(100) ~ 7 more planes, occupancy flat
    assert auto_plane_count(2_000 * 100) - auto_plane_count(2_000) == 7
    # degenerate inputs never go below the floor
    assert auto_plane_count(0) == 4
    assert auto_plane_count(1) == 4


def test_embedding_near_dup_auto_equals_explicit_planes(spark, clustered):
    from meerpipe_spark.operators.similarity import (
        auto_plane_count,
        deterministic_planes,
        embedding_near_dup,
    )

    got = embedding_near_dup(clustered, threshold=0.8, planes="auto").collect()
    planes = deterministic_planes(auto_plane_count(clustered.count()), 8)
    want = embedding_near_dup(clustered, threshold=0.8, planes=planes).collect()
    assert sorted((r.id_a, r.id_b) for r in got) == sorted(
        (r.id_a, r.id_b) for r in want
    )
    assert len(got) > 0  # clusters contain near-duplicate directions


# ---------------------------------------------------------------------------
# PCA power projection — round 5
# ---------------------------------------------------------------------------

def test_pca_converges_on_spiked_spectrum(spark):
    import math
    import random

    from pyspark.sql import Row
    from meerpipe_spark.operators.similarity import pca_power_projection

    # spiked covariance: strong direction u + small isotropic noise ->
    # large spectral gap -> 12 iterations converge
    rng = random.Random(5)
    d = 16
    u = [math.sin(k + 1.0) for k in range(d)]
    un = math.sqrt(sum(x * x for x in u))
    u = [x / un for x in u]
    rows = []
    for i in range(300):
        a = rng.gauss(0, 0.3)
        rows.append(
            Row(vec_id=i, embedding=[a * u[k] + rng.gauss(0, 0.01) for k in range(d)])
        )
    out = {r.vec_id: r.pc1_score for r in pca_power_projection(
        spark.createDataFrame(rows), iters=12).collect()}
    # the projection must recover each row's spike coefficient up to a
    # global sign and the small noise floor
    coeffs = {}
    for r in rows:
        coeffs[r.vec_id] = sum(r.embedding[k] * u[k] for k in range(d))
    sign = 1.0 if sum(out[i] * coeffs[i] for i in out) > 0 else -1.0
    err = max(abs(sign * out[i] - coeffs[i]) for i in out)
    assert err < 0.05, err


def test_pca_partitioning_invariant(spark):
    import random

    from pyspark.sql import Row
    from meerpipe_spark.operators.similarity import pca_power_projection

    rng = random.Random(9)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-0.5, 0.5) for _ in range(8)])
        for i in range(200)
    ]
    a = pca_power_projection(spark.createDataFrame(rows).coalesce(1), iters=12).collect()
    b = pca_power_projection(spark.createDataFrame(rows).repartition(11), iters=12).collect()
    # integer moments make the whole chain partition-order independent
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pca_top2_deflation_orders_and_separates(spark):
    import math
    import random

    from pyspark.sql import Row
    from meerpipe_spark.operators.similarity import pca_power_projection

    # two orthogonal spikes with distinct strengths
    rng = random.Random(17)
    d = 16
    u1 = [1.0 if k < d // 2 else 0.0 for k in range(d)]
    u2 = [0.0 if k < d // 2 else 1.0 for k in range(d)]
    n1 = math.sqrt(sum(x * x for x in u1)); u1 = [x / n1 for x in u1]
    n2 = math.sqrt(sum(x * x for x in u2)); u2 = [x / n2 for x in u2]
    rows = []
    for i in range(400):
        a = rng.gauss(0, 0.3)   # strong direction
        b = rng.gauss(0, 0.15)  # weaker direction
        rows.append(Row(vec_id=i, embedding=[
            a * u1[k] + b * u2[k] + rng.gauss(0, 0.01) for k in range(d)]))
    out = pca_power_projection(
        spark.createDataFrame(rows), iters=60, components=2).collect()
    r0 = out[0]
    assert r0.eigval1_scaled > r0.eigval2_scaled  # deflation ordering
    # pc1 must track the strong coefficient, pc2 the weak one (up to sign)
    import statistics
    a_true = {r.vec_id: sum(r.embedding[k] * u1[k] for k in range(d)) for r in rows}
    b_true = {r.vec_id: sum(r.embedding[k] * u2[k] for k in range(d)) for r in rows}
    def corr(xs, ys):
        mx, my = statistics.mean(xs), statistics.mean(ys)
        num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        den = math.sqrt(sum((x - mx) ** 2 for x in xs) * sum((y - my) ** 2 for y in ys))
        return num / den
    ids = [r.vec_id for r in out]
    c1 = abs(corr([a_true[i] for i in ids], [r.pc1_score for r in out]))
    c2 = abs(corr([b_true[i] for i in ids], [r.pc2_score for r in out]))
    assert c1 > 0.99 and c2 > 0.99, (c1, c2)


# --- product quantization (round 5, wave 4) ---------------------------------

def _pq_toy(spark, n=60, d=8):
    # three tight clusters in 8-d so a 2x4 PQ separates them perfectly
    from pyspark.sql import Row

    rows = []
    for i in range(n):
        c = i % 3
        base = [float(c * 10)] * d
        rows.append(Row(vec_id=i, embedding=[base[k] + ((i * 7 + k) % 3) * 0.01 for k in range(d)]))
    return spark.createDataFrame(rows)


def test_pq_codes_within_codebook_range(spark):
    from meerpipe_spark.operators.similarity import pq_encode, pq_train

    emb = _pq_toy(spark)
    cbs = pq_train(emb, m=2, ks=4, iters=2)
    codes = pq_encode(emb, cbs)
    assert codes.count() == 60 * 2
    rows = codes.collect()
    assert all(0 <= r.code < 4 for r in rows)
    assert {r.subspace for r in rows} == {0, 1}


def test_pq_adc_ranks_own_cluster_first(spark):
    from meerpipe_spark.operators.similarity import pq_adc_topk, pq_encode, pq_train

    emb = _pq_toy(spark)
    cbs = pq_train(emb, m=2, ks=4, iters=2)
    codes = pq_encode(emb, cbs)
    q = emb.filter("vec_id = 0").head()["embedding"]  # cluster 0
    top = pq_adc_topk(codes, cbs, q, k=20).collect()
    # every top-20 hit under ADC distance is a cluster-0 vector
    assert all(r.vec_id % 3 == 0 for r in top), top


def test_pq_encode_is_zero_shuffle(spark):
    from meerpipe_spark.operators.similarity import pq_encode, pq_train

    emb = _pq_toy(spark)
    cbs = pq_train(emb, m=2, ks=4, iters=2)
    plan = pq_encode(emb, cbs)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # literal codebook -> pure map: no join, no exchange anywhere
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_hard_negatives_auto_k_bounds_list_size(spark):
    from pyspark.sql import Row, functions as F
    from meerpipe_spark.operators.similarity import (
        HARD_NEG_TARGET_LIST,
        hard_negatives,
        ivf_assign,
        kmeans_centroids,
    )

    # 2000 vectors: fixed k=8 would make 250-vector lists; auto-k must
    # pick k=ceil(2000/256)=8 here and MORE clusters as n grows — check
    # the formula directly and that the default path completes with
    # every anchor served
    import math
    n = 2000
    assert max(8, math.ceil(n / HARD_NEG_TARGET_LIST)) == 8
    n = 20000
    assert max(8, math.ceil(n / HARD_NEG_TARGET_LIST)) == 79

    rows = [Row(vec_id=i, embedding=[float((i * 13 + d * 7) % 50) for d in range(8)],
                label=i % 4) for i in range(600)]
    emb = spark.createDataFrame(rows)
    out = hard_negatives(emb, per_anchor=1)  # default auto-k
    got = out.count()
    assert got > 0
    # every emitted negative has a different label than its anchor
    labels = {r.vec_id: r.label for r in rows}
    for r in out.collect():
        assert labels[r.src] != labels[r.dst]


def test_hard_negatives_salt_is_cost_only(spark, monkeypatch):
    """r13 optimization: small-k pair joins salt the cluster key
    (scale-adaptively; auto-k corpora resolve to salt=1) so the
    CPU-dense pair block parallelizes.  The salt must be COST-ONLY:
    forcing salt=1 by pretending 1 core must reproduce the salted
    path's negatives exactly (same pairs, same similarities)."""
    from pyspark.sql import Row
    from meerpipe_spark.operators import similarity as S

    rows = [Row(vec_id=i, embedding=[float((i * 13 + d * 7) % 50) for d in range(8)],
                label=i % 4) for i in range(600)]
    emb = spark.createDataFrame(rows)
    salted = sorted(map(tuple, S.hard_negatives(emb, centroids_k=8).collect()))
    assert S._pair_salt(spark.sparkContext.defaultParallelism, 8) > 1  # salted ran
    monkeypatch.setattr(S, "_pair_salt", lambda par, k: 1)
    unsalted = sorted(map(tuple, S.hard_negatives(emb, centroids_k=8).collect()))
    assert salted == unsalted


def test_mmr_select_diversifies(spark, sf_dir):
    """MMR property checks: step 1 is the plain relevance argmax; no
    vector is selected twice; and with lambda=0 the selection after the
    first pick maximizes DISTANCE from the selected set (pure
    diversity), which must differ from the pure-relevance ranking when
    near-duplicates lead it."""
    from pyspark.sql import functions as F

    from meerpipe_spark.io import load_tables
    from meerpipe_spark.operators.similarity import cosine_topk, mmr_select

    emb = load_tables(spark, sf_dir)["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    pool = emb.filter((F.col("vec_id") > 0) & (F.col("vec_id") < 200))

    rows = mmr_select(pool, qv, k=5, lam=0.7).collect()
    assert [r.step for r in rows] == [1, 2, 3, 4, 5]
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == 5
    top1 = cosine_topk(pool, qv, k=1).collect()[0]
    assert rows[0].vec_id == top1.vec_id
    # lambda=1 degrades to pure relevance top-5
    pure = [r.vec_id for r in cosine_topk(pool, qv, k=5).collect()]
    lam1 = [r.vec_id for r in mmr_select(pool, qv, k=5, lam=1.0).collect()]
    assert lam1 == pure
