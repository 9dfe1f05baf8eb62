"""Delay-correction rules engine (``dlyfix``).

Reference: meerpipe/scripts/dlyfix.py — a rule DSL (``ptuse.dlycfg``) of
ordered, named rules with predicates over observation attributes
(``mjd > x``, ``beconfig ~= regex``, …; :44-79) and delay actions
(``delay = v``, ``+= v``, ``-= v`` with ms/us/ns unit conversion;
:80-122). Matched rules are reduced IN FILE ORDER; a ``=`` action resets
all previously accumulated corrections (:99-104); the total correction is
the sum of the surviving ones (:276).

Spark-first (SURVEY.md J6 + A12 + W4):
- parse → a small rules DataFrame (broadcast; ~40 rows in the reference);
- match → broadcast theta join obs × rules on the conjunction of interval
  and regex predicates;
- ordered reduction with reset → a window over rule_order per obs: find
  the last rule_order with op '=', keep rules >= it, then a plain sum of
  signed deltas (the '=' rule contributes its own value).

At 100 TB the obs side streams through map tasks; the rules side is a
broadcast literal — the whole evaluation is shuffle-free except the final
per-obs aggregation, which is a partial-agg-friendly groupBy(obs_id).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F, types as T

_UNIT_SCALE = {"s": 1.0, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}

RULE_SCHEMA = T.StructType(
    [
        T.StructField("rule_name", T.StringType()),
        T.StructField("rule_order", T.IntegerType()),
        T.StructField("mjd_lo", T.DoubleType()),
        T.StructField("mjd_hi", T.DoubleType()),
        T.StructField("regex_attr", T.StringType()),
        T.StructField("regex_pat", T.StringType()),
        T.StructField("regex_negate", T.BooleanType()),
        T.StructField("delay_op", T.StringType()),
        T.StructField("delay_s", T.DoubleType()),
    ]
)

_PRED = re.compile(r"^\s*(\w+)\s*(~=|!~=|<=|>=|<|>)\s*(.+?)\s*$")
_ACT = re.compile(r"^\s*delay\s*(=|\+=|-=)\s*([-\d.eE]+)\s*(s|ms|us|ns)?\s*$")


def parse_dlycfg(lines: list[str]) -> list[dict]:
    """Parse a dlycfg-style rule DSL into ordered rule records.

    Grammar (per dlyfix.py:27-125): blocks introduced by ``[name]``;
    predicate lines ``attr <op> operand`` with ops ``~= !~= < > <= >=``;
    action lines ``delay (=|+=|-=) value [unit]``. Numeric comparisons on
    ``mjd`` become the [mjd_lo, mjd_hi) interval; regex predicates keep
    (attr, pattern, negated).
    """
    rules: list[dict] = []
    cur: dict | None = None
    order = 0
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = re.match(r"^\[(.+)\]$", line)
        if m:
            if cur is not None:
                rules.append(cur)
            cur = {
                "rule_name": m.group(1),
                "rule_order": order,
                "mjd_lo": float("-inf"),
                "mjd_hi": float("inf"),
                "regex_attr": None,
                "regex_pat": None,
                "regex_negate": False,
                "delay_op": "+=",
                "delay_s": 0.0,
            }
            order += 1
            continue
        if cur is None:
            continue
        act = _ACT.match(line)
        if act:
            op, val, unit = act.group(1), float(act.group(2)), act.group(3) or "s"
            cur["delay_op"] = op
            cur["delay_s"] = val * _UNIT_SCALE[unit]
            continue
        pred = _PRED.match(line)
        if pred:
            attr, op, operand = pred.groups()
            if attr == "mjd" and op in ("<", "<=", ">", ">="):
                v = float(operand)
                if op in (">", ">="):
                    cur["mjd_lo"] = v
                else:
                    cur["mjd_hi"] = v
            elif op in ("~=", "!~="):
                cur["regex_attr"] = attr
                cur["regex_pat"] = operand
                cur["regex_negate"] = op == "!~="
    if cur is not None:
        rules.append(cur)
    return rules


def rules_df(spark: SparkSession, rules: list[dict]) -> DataFrame:
    return spark.createDataFrame([tuple(r[f.name] for f in RULE_SCHEMA.fields) for r in rules], RULE_SCHEMA)


def evaluate_delay_rules(
    obs: DataFrame,
    rules: DataFrame,
    mjd_col: str = "mjd",
    attr_cols: dict[str, str] | None = None,
    obs_key: str = "obs_id",
) -> DataFrame:
    """J6 theta join + A12 ordered reduction with reset.

    ``attr_cols`` maps rule regex_attr names to obs column names (e.g.
    {"beconfig": "beconfig"}). Returns (obs_key, delay_s) with the total
    correction per observation; observations matching no rule get 0.0.
    """
    attr_cols = attr_cols or {}
    attr_expr = F.lit(None).cast("string")
    for attr, col in attr_cols.items():
        attr_expr = F.when(rules["regex_attr"] == attr, obs[col]).otherwise(attr_expr)

    regex_ok = (
        F.when(rules["regex_pat"].isNull(), F.lit(True))
        .when(rules["regex_negate"], ~F.regexp_like(attr_expr, rules["regex_pat"]))
        .otherwise(F.regexp_like(attr_expr, rules["regex_pat"]))
    )
    cond = (
        (obs[mjd_col] > rules["mjd_lo"])
        & (obs[mjd_col] < rules["mjd_hi"])
        & regex_ok
    )
    matched = obs.join(F.broadcast(rules), cond, "inner")

    # Reset boundary: the max rule_order among matched '=' rules per obs;
    # rules before it are discarded (dlyfix.py:99-104 self.corrections=[]).
    w = W.partitionBy(obs_key)
    with_reset = matched.withColumn(
        "reset_order",
        F.max(F.when(F.col("delay_op") == "=", F.col("rule_order"))).over(w),
    )
    surviving = with_reset.filter(
        F.col("reset_order").isNull() | (F.col("rule_order") >= F.col("reset_order"))
    )
    signed = F.when(F.col("delay_op") == "-=", -F.col("delay_s")).otherwise(F.col("delay_s"))
    totals = surviving.groupBy(obs_key).agg(F.sum(signed).alias("delay_s"))
    return (
        obs.select(obs_key)
        .distinct()
        .join(totals, obs_key, "left")
        .withColumn("delay_s", F.coalesce(F.col("delay_s"), F.lit(0.0)))
    )


def apply_delay_corrections(
    obs: DataFrame,
    totals: DataFrame,
    obs_key: str = "obs_id",
    offs_col: str = "stt_offs",
    cur_delay_col: str = "cur_delay_s",
) -> tuple[DataFrame, DataFrame]:
    """§3.4 output side (dlyfix.py:273-304): apply the evaluated total
    correction to the start-time offset and emit provenance.

        new_offs = stt_offs - cur_delay + total_correction

    Returns (updated_obs, provenance): the reference appends a
    ``dlyfix`` PROC_CMD history row into the FITS file; here provenance
    is an append-only audit DataFrame (obs_id, proc_cmd, delay_s,
    applied_at) ready for sinks.upsert_by_key / append — the
    already-applied check (F10) then anti-joins this table.
    """
    joined = obs.join(F.broadcast(totals), obs_key, "left").withColumn(
        "_delay", F.coalesce(F.col("delay_s"), F.lit(0.0))
    )
    cur = (
        F.col(cur_delay_col)
        if cur_delay_col in obs.columns
        else F.lit(0.0)
    )
    updated = joined.withColumn(
        offs_col,
        F.col(offs_col).cast("decimal(38,19)")
        - cur.cast("decimal(38,19)")
        + F.col("_delay").cast("decimal(38,19)"),
    ).drop("_delay", "delay_s")
    provenance = joined.select(
        F.col(obs_key),
        F.concat(F.lit("dlyfix delay="), F.col("_delay").cast("string")).alias("proc_cmd"),
        F.col("_delay").alias("delay_s"),
        F.current_timestamp().alias("applied_at"),
    )
    return updated, provenance
