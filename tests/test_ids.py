"""Dense ID assignment: exact global rank, contiguity, partitioning
independence, and the plan property (no single-partition global sort)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.ids import assign_dense_ids


def _df(spark, n=500, parts=None):
    df = spark.createDataFrame([Row(k=f"key-{i:05d}", v=i) for i in range(n)])
    return df.repartition(parts) if parts else df


def test_ids_match_global_rank(spark):
    df = _df(spark, 300)
    out = assign_dense_ids(df, ["k"], num_partitions=5)
    got = {r.k: r.dense_id for r in out.collect()}
    want = {f"key-{i:05d}": i for i in range(300)}  # keys sort like ints here
    assert got == want


def test_ids_contiguous_and_unique(spark):
    out = assign_dense_ids(_df(spark, 257, parts=9), ["k"], num_partitions=4)
    ids = sorted(r.dense_id for r in out.collect())
    assert ids == list(range(257))


def test_ids_partitioning_independent(spark):
    a = {(r.k, r.dense_id) for r in assign_dense_ids(_df(spark, 200, parts=3), ["k"], num_partitions=2).collect()}
    b = {(r.k, r.dense_id) for r in assign_dense_ids(_df(spark, 200, parts=11), ["k"], num_partitions=7).collect()}
    assert a == b


def test_ids_no_single_partition_global_sort(spark):
    out = assign_dense_ids(_df(spark, 100), ["k"], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scale-killer plan shape is Exchange SinglePartition feeding a
    # global Window/Sort; the operator must never produce it
    assert "SinglePartition" not in plan
