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
