"""Delay-rules engine tests: real dlyfix DSL parse ('* name' headers,
sequential predicates, multi-action blocks, attribute-valued conversion)
+ theta-join evaluation with order-sensitive reset reduction, checked
against a sequential python evaluator implementing the reference
semantics (dlyfix.py:27-125), and a golden test on the reference's
verbatim ptuse.dlycfg."""

from __future__ import annotations

import os
import re

import numpy as np
import pytest
from pyspark.sql import Row

from meerpipe_spark.operators.delay_rules import (
    evaluate_delay_rules,
    parse_dlycfg,
    rules_df,
)

DLYCFG = """
# ptuse-style delay rules in the reference's real grammar
* early epoch
mjd > 58000
mjd <= 58500
delay += 10 us

* bad firmware
beconfig ~= cbf.*v1
delay += 2 us

* recalibration   # '=' resets everything before it, then more actions add
mjd >= 58200
delay = 5 us
delay += 3 ns

* late trim
mjd > 58400
delay -= 1 us

* not special
beconfig !~= special.*
delay += 100 ns

* tbin scaled
mjd > 58100
delay += 2 tbin
"""

PTUSE_DLYCFG = "/root/reference/meerpipe/data/ptuse.dlycfg"


def _sequential_eval(lines, attrs):
    """Sequential interpreter with the reference's semantics
    (dlyfix.py:27-125): skip-flag per block, re.match-anchored regex,
    strict/inclusive comparisons, unit or attribute conversion, '='
    clearing all prior corrections. Used as the test oracle."""
    corrections: list[float] = []
    skip = True
    for raw in lines:
        elems = raw.split("#")[0].split()
        if not elems:
            continue
        if elems[0] == "*":
            skip = False
            continue
        if skip or len(elems) < 3:
            continue
        lhs, op, operand = elems[0], elems[1], elems[2]
        if lhs == "delay" and op in ("=", "+=", "-="):
            conv = 1.0
            if len(elems) > 3:
                unit = elems[3]
                fixed = {"s": 1.0, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}
                conv = fixed[unit] if unit in fixed else float(attrs[unit])
            val = float(operand) * conv
            if op == "=":
                corrections = [val]
            else:
                corrections.append(val if op == "+=" else -val)
        elif op in ("~=", "!~="):
            hit = re.match(operand, str(attrs[lhs])) is not None
            if hit == (op == "!~="):
                skip = True
        elif op in ("<", ">", "<=", ">="):
            v, t = float(attrs[lhs]), float(operand)
            ok = {"<": v < t, ">": v > t, "<=": v <= t, ">=": v >= t}[op]
            if not ok:
                skip = True
    return sum(corrections)


def _spark_eval(spark, actions, obs_rows):
    out = evaluate_delay_rules(
        spark.createDataFrame(obs_rows),
        rules_df(spark, actions),
        attr_cols={"beconfig": "beconfig", "tbin": "tbin"},
    )
    return {r.obs_id: r.delay_s for r in out.collect()}


def test_parse_dlycfg():
    acts = parse_dlycfg(DLYCFG.splitlines())
    assert [a["rule_name"] for a in acts] == [
        "early epoch", "bad firmware", "recalibration", "recalibration",
        "late trim", "not special", "tbin scaled",
    ]
    assert [a["action_order"] for a in acts] == list(range(7))
    # sequential predicate snapshots
    assert acts[0]["preds"] == [
        {"attr": "mjd", "op": ">", "num": 58000.0, "pat": None},
        {"attr": "mjd", "op": "<=", "num": 58500.0, "pat": None},
    ]
    assert acts[1]["preds"][0] == {"attr": "beconfig", "op": "~=", "num": None, "pat": "cbf.*v1"}
    # multiple actions in one block share the block's predicates
    assert acts[2]["delay_op"] == "=" and acts[2]["delay_val"] == 5.0 and acts[2]["delay_unit"] == "us"
    assert acts[3]["delay_op"] == "+=" and acts[3]["delay_unit"] == "ns"
    assert acts[2]["preds"] == acts[3]["preds"] == [
        {"attr": "mjd", "op": ">=", "num": 58200.0, "pat": None}
    ]
    assert acts[5]["preds"][0]["op"] == "!~="
    # attribute-valued conversion
    assert acts[6]["delay_unit"] == "tbin" and acts[6]["delay_val"] == 2.0


def test_parse_compat_bracket_headers():
    acts = parse_dlycfg(["[old style]", "mjd > 10", "delay += 1 us"])
    assert acts[0]["rule_name"] == "old style"
    assert acts[0]["preds"] == [{"attr": "mjd", "op": ">", "num": 10.0, "pat": None}]


def test_parse_warns_on_garbage(caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="meerpipe_spark.operators.delay_rules"):
        acts = parse_dlycfg(["* r", "this is not a rule line", "delay += 1 us"])
    assert len(acts) == 1
    assert any("cannot understand" in m for m in caplog.messages)


def test_evaluate_matches_sequential(spark):
    acts = parse_dlycfg(DLYCFG.splitlines())
    rng = np.random.default_rng(3)
    obs = [
        Row(
            obs_id=f"obs{i}",
            mjd=float(rng.uniform(57900, 58700)),
            beconfig=rng.choice(["cbf_256_v1", "cbf_256_v2", "special_mode"]).item(),
            tbin=float(rng.choice([9.5e-6, 1.2e-5])),
        )
        for i in range(60)
    ]
    got = _spark_eval(spark, acts, obs)
    for o in obs:
        expect = _sequential_eval(
            DLYCFG.splitlines(), {"mjd": o.mjd, "beconfig": o.beconfig, "tbin": o.tbin}
        )
        assert got[o.obs_id] == pytest.approx(expect, abs=1e-15), o


def test_inclusive_boundaries(spark):
    acts = parse_dlycfg(DLYCFG.splitlines())
    # mjd exactly on the inclusive bounds: 58500 (<=) in rule 1, 58200 (>=)
    # in the reset rule — both must match (dlyfix.py:68-79).
    for mjd, beconfig in [(58500.0, "special_mode"), (58200.0, "special_mode")]:
        obs = [Row(obs_id="b", mjd=mjd, beconfig=beconfig, tbin=1e-5)]
        got = _spark_eval(spark, acts, obs)
        expect = _sequential_eval(
            DLYCFG.splitlines(), {"mjd": mjd, "beconfig": beconfig, "tbin": 1e-5}
        )
        assert got["b"] == pytest.approx(expect, abs=1e-15)
        assert expect != 0.0  # the boundary rule really fired


def test_regex_is_anchored(spark):
    # re.match semantics: pattern must match at the START of the value
    # (dlyfix.py:46). 'cbf.*v1' must NOT match 'xx_cbf_v1'.
    acts = parse_dlycfg(["* r", "beconfig ~= cbf.*v1", "delay += 1 us"])
    got = _spark_eval(
        spark,
        acts,
        [
            Row(obs_id="prefix", mjd=0.0, beconfig="cbf_256_v1", tbin=1e-5),
            Row(obs_id="midstring", mjd=0.0, beconfig="xx_cbf_v1", tbin=1e-5),
        ],
    )
    assert got["prefix"] == pytest.approx(1e-6)
    assert got["midstring"] == 0.0


def test_predicates_only_guard_following_actions(spark):
    # dlyfix evaluates lines sequentially: an action ABOVE a failing
    # predicate still fires (skip only flips when the predicate is read).
    cfg = ["* r", "delay += 1 us", "mjd > 1000", "delay += 2 us"]
    acts = parse_dlycfg(cfg)
    assert acts[0]["preds"] == [] and len(acts[1]["preds"]) == 1
    got = _spark_eval(spark, acts, [Row(obs_id="o", mjd=5.0, beconfig="x", tbin=1e-5)])
    expect = _sequential_eval(cfg, {"mjd": 5.0, "beconfig": "x", "tbin": 1e-5})
    assert got["o"] == pytest.approx(1e-6) and expect == pytest.approx(1e-6)


def test_reset_discards_prior_rules(spark):
    acts = parse_dlycfg(DLYCFG.splitlines())
    # mjd 58450, beconfig not matching rule 2 nor 'special':
    # early(+10us) wiped by '='(5us), then +3ns, -1us, +100ns, +2*tbin
    obs = [Row(obs_id="x", mjd=58450.0, beconfig="cbf_256_v2", tbin=1e-5)]
    got = _spark_eval(spark, acts, obs)
    assert got["x"] == pytest.approx(5e-6 + 3e-9 - 1e-6 + 100e-9 + 2e-5)


def test_grouped_reset_is_per_observation(spark):
    """In the grouped (unique_keys=False) path a '=' matched on ONE row of
    an observation clears contributions accumulated from SIBLING rows —
    the reset boundary is evaluated per obs_key, not per row."""
    acts = parse_dlycfg(
        [
            "* always",
            "delay += 10 us",
            "* special reset",
            "beconfig ~= special",
            "delay = 5 us",
        ]
    )
    obs = [
        Row(obs_id="g", mjd=58000.0, beconfig="normal", tbin=1e-5),
        Row(obs_id="g", mjd=58000.0, beconfig="special_mode", tbin=1e-5),
    ]
    got = _spark_eval(spark, acts, obs)
    # row 1 alone would add +10us (order 0) and row 2 matches the '='
    # (order 1): the observation-level reset wipes row 1's contribution,
    # leaving only the '=' value. The buggy per-row form yields 15us.
    assert got["g"] == pytest.approx(5e-6, abs=1e-15)


def test_no_match_returns_zero(spark):
    acts = parse_dlycfg(DLYCFG.splitlines())
    obs = [Row(obs_id="y", mjd=10000.0, beconfig="special_mode", tbin=1e-5)]
    assert _spark_eval(spark, acts, obs)["y"] == 0.0


@pytest.mark.skipif(not os.path.exists(PTUSE_DLYCFG), reason="reference data not present")
def test_golden_ptuse_dlycfg(spark):
    """Parse the reference's verbatim ptuse.dlycfg (7 rules, all '+=' with
    us units and mjd windows) and match hand-computed totals."""
    with open(PTUSE_DLYCFG) as f:
        lines = f.readlines()
    acts = parse_dlycfg(lines)
    assert len(acts) == 7
    assert all(a["delay_op"] == "+=" and a["delay_unit"] == "us" for a in acts)
    assert acts[0]["rule_name"].startswith("1K mode, PTM not applied")
    assert acts[5]["rule_name"] == "306 microsec offset in CBF"
    assert all(len(a["preds"]) == 2 for a in acts)

    obs = [
        Row(obs_id="all7", mjd=58600.0, beconfig="x", tbin=1e-5),   # every rule fires
        Row(obs_id="late", mjd=59500.0, beconfig="x", tbin=1e-5),   # CBF + half-sample windows closed
        Row(obs_id="early", mjd=58000.0, beconfig="x", tbin=1e-5),  # before everything
        Row(obs_id="w1", mjd=58530.0, beconfig="x", tbin=1e-5),     # only rules 1 and 7
    ]
    got = _spark_eval(spark, acts, obs)
    # hand-computed: sum of all seven us values
    all7 = (-24.629 + 24.630 - 1.196 - 4.785 + 0.5981308411 - 306.243 - 1.1962616822) * 1e-6
    assert got["all7"] == pytest.approx(all7, rel=1e-12)
    assert got["early"] == 0.0
    assert got["w1"] == pytest.approx((-24.629 - 1.1962616822) * 1e-6, rel=1e-12)
    for o in obs:
        expect = _sequential_eval(lines, {"mjd": o.mjd, "beconfig": o.beconfig, "tbin": o.tbin})
        assert got[o.obs_id] == pytest.approx(expect, abs=1e-18), o


def test_apply_delay_corrections_and_provenance(spark):
    from meerpipe_spark.operators.delay_rules import apply_delay_corrections

    obs = spark.createDataFrame(
        [Row(obs_id="a", stt_offs=0.5), Row(obs_id="b", stt_offs=0.25)]
    )
    totals = spark.createDataFrame([Row(obs_id="a", delay_s=1e-6)])
    updated, provenance = apply_delay_corrections(obs, totals)
    got = {r.obs_id: r.stt_offs for r in updated.collect()}
    assert float(got["a"]) == pytest.approx(0.5 + 1e-6)
    assert float(got["b"]) == pytest.approx(0.25)  # no matching rule -> unchanged
    prov = {r.obs_id: r for r in provenance.collect()}
    assert prov["a"].proc_cmd.startswith("dlyfix")  # F10 checks this prefix
    assert prov["a"].delay_s == pytest.approx(1e-6)
