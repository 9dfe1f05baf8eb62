"""Delay-rules engine tests: DSL parse + theta-join evaluation with
order-sensitive reset reduction, property-tested against a sequential
python evaluator implementing the reference semantics (dlyfix.py:80-122)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from meerpipe_spark.operators.delay_rules import (
    evaluate_delay_rules,
    parse_dlycfg,
    rules_df,
)

DLYCFG = """
# ptuse-style delay rules
[early_epoch]
mjd > 58000
mjd < 58500
delay += 10 us

[bad_firmware]
beconfig ~= cbf.*v1
delay += 2 us

[recalibration]      # '=' resets everything before it
mjd > 58200
delay = 5 us

[late_trim]
mjd > 58400
delay -= 1 us

[not_special]
beconfig !~= special.*
delay += 100 ns
"""


def _sequential_eval(rules, mjd, attrs):
    """Reference semantics: walk rules in order; '=' clears accumulated
    corrections; sum at the end (dlyfix.py:80-122,276)."""
    import re

    corrections = []
    for r in rules:
        if not (mjd > r["mjd_lo"] and mjd < r["mjd_hi"]):
            continue
        if r["regex_pat"] is not None:
            val = attrs.get(r["regex_attr"], "")
            m = re.search(r["regex_pat"], val) is not None
            if r["regex_negate"]:
                m = not m
            if not m:
                continue
        if r["delay_op"] == "=":
            corrections = [r["delay_s"]]
        elif r["delay_op"] == "+=":
            corrections.append(r["delay_s"])
        else:
            corrections.append(-r["delay_s"])
    return sum(corrections)


def test_parse_dlycfg():
    rules = parse_dlycfg(DLYCFG.splitlines())
    assert [r["rule_name"] for r in rules] == [
        "early_epoch", "bad_firmware", "recalibration", "late_trim", "not_special",
    ]
    assert rules[0]["mjd_lo"] == 58000 and rules[0]["mjd_hi"] == 58500
    assert rules[0]["delay_s"] == pytest.approx(10e-6)
    assert rules[1]["regex_attr"] == "beconfig" and not rules[1]["regex_negate"]
    assert rules[2]["delay_op"] == "="
    assert rules[3]["delay_op"] == "-=" and rules[3]["delay_s"] == pytest.approx(1e-6)
    assert rules[4]["regex_negate"]
    assert rules[4]["delay_s"] == pytest.approx(100e-9)


def test_evaluate_matches_sequential(spark):
    rules = parse_dlycfg(DLYCFG.splitlines())
    rng = np.random.default_rng(3)
    obs = []
    for i in range(60):
        obs.append(
            Row(
                obs_id=f"obs{i}",
                mjd=float(rng.uniform(57900, 58700)),
                beconfig=rng.choice(["cbf_256_v1", "cbf_256_v2", "special_mode"]).item(),
            )
        )
    obs_df = spark.createDataFrame(obs)
    out = {
        r.obs_id: r.delay_s
        for r in evaluate_delay_rules(
            obs_df, rules_df(spark, rules), attr_cols={"beconfig": "beconfig"}
        ).collect()
    }
    for o in obs:
        expect = _sequential_eval(rules, o.mjd, {"beconfig": o.beconfig})
        assert out[o.obs_id] == pytest.approx(expect, abs=1e-15), o


def test_reset_discards_prior_rules(spark):
    rules = parse_dlycfg(DLYCFG.splitlines())
    # mjd 58450, non-matching beconfig for rule2, not 'special':
    # early_epoch(+10us) then recalibration(=5us) wipes it, late_trim(-1us),
    # not_special(+100ns) => 4.1us
    obs_df = spark.createDataFrame([Row(obs_id="x", mjd=58450.0, beconfig="cbf_256_v2")])
    out = evaluate_delay_rules(
        obs_df, rules_df(spark, rules), attr_cols={"beconfig": "beconfig"}
    ).collect()[0]
    assert out.delay_s == pytest.approx(5e-6 - 1e-6 + 100e-9)


def test_no_match_returns_zero(spark):
    rules = parse_dlycfg(DLYCFG.splitlines())
    obs_df = spark.createDataFrame([Row(obs_id="y", mjd=10000.0, beconfig="special_mode")])
    out = evaluate_delay_rules(
        obs_df, rules_df(spark, rules), attr_cols={"beconfig": "beconfig"}
    ).collect()[0]
    assert out.delay_s == 0.0


def test_apply_delay_corrections_and_provenance(spark):
    from decimal import Decimal

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
