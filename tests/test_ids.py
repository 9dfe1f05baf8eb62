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


def test_dense_ids_survive_nondeterministic_range_boundaries(spark):
    """REGRESSION (round 7): Spark's range exchange samples boundaries
    with an execution-dependent seed, so the count job and the rank job
    used to see DIFFERENT partitionings on multi-partition inputs —
    ~60% of ranks corrupt on this exact input before the tracked
    persist pinned one materialization for both jobs. Keys are unique
    (48271 coprime to 500009), so the correct result is exactly
    0..n-1 in key order."""
    from meerpipe_spark.operators.ids import assign_dense_ids

    df = (
        spark.range(0, 200_000)
        .select((F.col("id") * 48271 % 500009).alias("k"))
        .repartition(32)
    )
    got = sorted((r.k, r.rk) for r in assign_dense_ids(df, ["k"], id_name="rk").collect())
    assert sum(1 for i, (_, rk) in enumerate(got) if rk != i) == 0
