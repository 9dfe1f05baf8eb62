"""Binned range join: exactly-once matching, half-open boundary
semantics, equivalence with the naive theta join, and the plan property
that motivates the operator (equi-join, not a nested-loop product)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.rangejoin import binned_interval_join


def _pts(spark, ts):
    return spark.createDataFrame([Row(pid=i, t=t) for i, t in enumerate(ts)])


def _ivs(spark, spans):
    return spark.createDataFrame([Row(iid=i, s=s, e=e) for i, (s, e) in enumerate(spans)])


def test_matches_naive_theta_join(spark):
    import random

    rng = random.Random(7)
    pts = _pts(spark, [rng.randrange(0, 10_000) for _ in range(300)])
    ivs = _ivs(spark, [(s, s + rng.randrange(1, 900)) for s in (rng.randrange(0, 9_500) for _ in range(40))])
    got = {
        (r.pid, r.iid)
        for r in binned_interval_join(pts, ivs, "t", "s", "e", bucket_width=250).collect()
    }
    want = {
        (r.pid, r.iid)
        for r in pts.join(ivs, (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))).collect()
    }
    assert got == want and len(want) > 0


def test_exactly_once_when_interval_spans_many_buckets(spark):
    pts = _pts(spark, [500])
    ivs = _ivs(spark, [(0, 10_000)])  # spans 100 buckets at width 100
    out = binned_interval_join(pts, ivs, "t", "s", "e", bucket_width=100).collect()
    assert len(out) == 1  # the point's single bucket dedups the match


def test_half_open_boundaries(spark):
    pts = _pts(spark, [100, 200])  # t == s kept, t == e excluded
    ivs = _ivs(spark, [(100, 200)])
    out = binned_interval_join(pts, ivs, "t", "s", "e", bucket_width=50).collect()
    assert [(r.pid, r.iid) for r in out] == [(0, 0)]


def test_plan_is_equi_join_not_nested_loop(spark):
    pts = _pts(spark, list(range(100)))
    ivs = _ivs(spark, [(i * 10, i * 10 + 25) for i in range(10)])
    df = binned_interval_join(pts, ivs, "t", "s", "e", bucket_width=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_keys_param_confines_matches_to_entity(spark):
    """The composite (entity, bucket) key: a point must only see its
    OWN entity's intervals even when another entity's interval covers
    the same time range."""
    from meerpipe_spark.operators.rangejoin import binned_interval_join

    points = spark.createDataFrame(
        [("u1", 50), ("u2", 50)], "ent STRING, t BIGINT"
    )
    intervals = spark.createDataFrame(
        [("u1", 0, 100, "a"), ("u2", 0, 100, "b")],
        "ent STRING, s BIGINT, e BIGINT, tag STRING",
    )
    got = {
        (r.ent, r.tag)
        for r in binned_interval_join(
            points, intervals, "t", "s", "e", bucket_width=10, keys=["ent"]
        ).collect()
    }
    assert got == {("u1", "a"), ("u2", "b")}
