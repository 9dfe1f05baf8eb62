"""Property-based tests (hypothesis) for the order-sensitive and
modular-arithmetic hard parts (SURVEY.md §7.3.2/§7.3.3): randomized rule
sets and observations vs the sequential reference evaluator, and
phase-normalization invariants."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.delay_rules import evaluate_delay_rules, rules_df
from meerpipe_spark.operators.phase import phase_norm
from tests.test_delay_rules import _sequential_eval


def _mk_rule(i, lo, hi, op, val, pat, neg):
    return {
        "rule_name": f"r{i}",
        "rule_order": i,
        "mjd_lo": lo,
        "mjd_hi": hi,
        "regex_attr": "beconfig" if pat else None,
        "regex_pat": pat,
        "regex_negate": neg,
        "delay_op": op,
        "delay_s": val,
    }


rule_strategy = st.builds(
    _mk_rule,
    st.integers(0, 0),  # order assigned below
    st.floats(0, 50, allow_nan=False),
    st.floats(50, 100, allow_nan=False),
    st.sampled_from(["=", "+=", "-="]),
    st.floats(-10, 10, allow_nan=False, allow_infinity=False),
    st.sampled_from([None, "aa", "bb", "^aa", "a.b"]),
    st.booleans(),
)


@settings(max_examples=8, deadline=None)
@given(
    rules=st.lists(rule_strategy, min_size=1, max_size=8),
    mjds=st.lists(st.floats(0, 100, allow_nan=False), min_size=1, max_size=6),
    attrs=st.lists(st.sampled_from(["aab", "bba", "xyz", "a_b"]), min_size=1, max_size=6),
)
def test_delay_reduction_matches_sequential(spark, rules, mjds, attrs):
    for i, r in enumerate(rules):
        r["rule_order"] = i
    n = min(len(mjds), len(attrs))
    obs = [
        Row(obs_id=f"o{i}", mjd=float(mjds[i]), beconfig=attrs[i]) for i in range(n)
    ]
    got = {
        r.obs_id: r.delay_s
        for r in evaluate_delay_rules(
            spark.createDataFrame(obs),
            rules_df(spark, rules),
            attr_cols={"beconfig": "beconfig"},
        ).collect()
    }
    for o in obs:
        expect = _sequential_eval(rules, o.mjd, {"beconfig": o.beconfig})
        assert math.isclose(got[o.obs_id], expect, rel_tol=1e-12, abs_tol=1e-12), (
            rules, o, got[o.obs_id], expect,
        )


@settings(max_examples=10, deadline=None)
@given(
    xs=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=20,
    ),
    mod=st.floats(0.1, 1000, allow_nan=False),
)
def test_phase_norm_invariants(spark, xs, mod):
    df = spark.createDataFrame([Row(x=float(x)) for x in xs])
    out = df.select("x", phase_norm(F.col("x"), mod).alias("p")).collect()
    for r in out:
        assert 0.0 <= r.p < mod, r
        # p ≡ x (mod m): difference is an integer multiple of m
        k = (r.x - r.p) / mod
        assert math.isclose(k, round(k), abs_tol=1e-6), r
