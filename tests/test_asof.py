"""As-of join operator tests: backward/forward semantics, tie handling
(right row at equal ts wins), left rows with no match, multi-key groups,
deterministic tiebreak among equal-(key, ts) right rows, and plan shape
(one shuffle, no range explosion)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from meerpipe_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(lid=1, k="a", ts=_ts(10), lv=1.0),
            Row(lid=2, k="a", ts=_ts(20), lv=2.0),
            Row(lid=3, k="a", ts=_ts(5), lv=3.0),   # before any right row
            Row(lid=4, k="b", ts=_ts(15), lv=4.0),
            Row(lid=5, k="b", ts=_ts(30), lv=5.0),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(8), rv=100.0, rid=1),
            Row(k="a", ts=_ts(20), rv=200.0, rid=2),  # equal-ts tie with lid=2
            Row(k="b", ts=_ts(16), rv=300.0, rid=3),
        ]
    )
    return left, right


def test_backward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts_col="ts", value_cols=["rv"])
    got = {r.lid: r.rv_asof for r in out.collect()}
    # lid=1 (t=10): nearest preceding right in 'a' is t=8 -> 100
    # lid=2 (t=20): right at exactly t=20 matches (<= semantics) -> 200
    # lid=3 (t=5): nothing before -> null
    # lid=4 (t=15 in 'b'): right is t=16, in the future -> null
    # lid=5 (t=30 in 'b'): t=16 -> 300
    assert got == {1: 100.0, 2: 200.0, 3: None, 4: None, 5: 300.0}
    ts_got = {r.lid: r.ts_asof for r in out.collect()}
    assert ts_got[2] == _ts(20) and ts_got[3] is None


def test_forward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts_col="ts", value_cols=["rv"], direction="forward")
    got = {r.lid: r.rv_asof for r in out.collect()}
    # lid=1 (t=10): next right in 'a' is t=20 -> 200
    # lid=2 (t=20): equal ts matches forward too -> 200
    # lid=3 (t=5): next is t=8 -> 100
    # lid=4 (t=15): next in 'b' is t=16 -> 300
    # lid=5 (t=30): nothing after -> null
    assert got == {1: 200.0, 2: 200.0, 3: 100.0, 4: 300.0, 5: None}


def test_tiebreak_among_equal_right_rows(spark):
    left = spark.createDataFrame([Row(lid=1, k="a", ts=_ts(10), lv=0.0)])
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), rv=1.0, rid=7),
            Row(k="a", ts=_ts(10), rv=2.0, rid=9),  # higher rid wins
        ]
    )
    out = asof_join(
        left, right, on="k", ts_col="ts", value_cols=["rv"], tiebreak_col="rid"
    )
    assert out.collect()[0].rv_asof == 2.0


def test_left_columns_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts_col="ts", value_cols=["rv"])
    assert set(out.columns) == {"k", "lid", "ts", "lv", "rv_asof", "ts_asof"}
    assert out.count() == left.count()


def test_plan_single_shuffle_no_join(spark):
    """The as-of compiles to union + ONE window (one exchange on the
    key) — no join operator, no range explosion."""
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts_col="ts", value_cols=["rv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
