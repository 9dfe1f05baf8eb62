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


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof — an independent
    reference implementation of backward as-of semantics."""
    import pandas as pd
    import random

    rng = random.Random(42)
    lrows = [
        Row(lid=i, k=f"k{rng.randrange(5)}", ts=_ts(rng.randrange(1000)), lv=float(i))
        for i in range(300)
    ]
    # unique (k, ts) on the right: sample without replacement per key
    rrows = []
    rid = 0
    for kk in range(5):
        for t in rng.sample(range(1000), 40):
            rrows.append(Row(k=f"k{kk}", ts=_ts(t), rv=float(rid), rid=rid))
            rid += 1
    left, right = spark.createDataFrame(lrows), spark.createDataFrame(rrows)

    got = {
        r.lid: r.rv_asof
        for r in asof_join(left, right, on="k", ts_col="ts", value_cols=["rv"]).collect()
    }

    lp = pd.DataFrame([r.asDict() for r in lrows]).sort_values("ts")
    rp = pd.DataFrame([r.asDict() for r in rrows]).sort_values("ts")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    expect = {
        int(row.lid): (None if pd.isna(row.rv) else float(row.rv))
        for row in merged.itertuples()
    }
    assert got == expect


def test_reserved_column_names_rejected(spark):
    import pytest

    left = spark.createDataFrame([Row(lid=1, k="a", ts=_ts(1), _side=1)])
    right = spark.createDataFrame([Row(k="a", ts=_ts(0), rv=1.0)])
    with pytest.raises(ValueError, match="_side"):
        asof_join(left, right, on="k", ts_col="ts", value_cols=["rv"])


def test_cogrouped_asof_null_when_no_preceding_ref(spark):
    from pyspark.sql import functions as F

    from meerpipe_spark.operators.asof import cogrouped_asof_residuals

    events = spark.createDataFrame(
        [(1, 1, "2024-01-01 05:00:00", 10.0), (1, 2, "2024-01-03 00:00:00", 7.5)],
        "user_id BIGINT, event_id BIGINT, ts STRING, value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts"))
    refs = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00", 2.5)],
        "user_id BIGINT, ref_ts STRING, ref_value DOUBLE",
    ).withColumn("ref_ts", F.to_timestamp("ref_ts"))
    got = {
        r["event_id"]: r["residual"]
        for r in cogrouped_asof_residuals(events, refs).collect()
    }
    assert got[1] is None      # event precedes every reference
    assert got[2] == 5.0       # 7.5 - 2.5
