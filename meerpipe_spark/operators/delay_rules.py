"""Delay-correction rules engine (``dlyfix``).

Reference: meerpipe/scripts/dlyfix.py — a rule DSL (``ptuse.dlycfg``) of
ordered, named rules. Grammar (dlyfix.py:27-125):

- ``* name`` introduces a rule block (name = line stripped of ``* \\t\\n``);
  ``[name]`` is also accepted here for compatibility with older corpora.
- ``#`` starts a comment anywhere on a line (dlyfix.py:36).
- Predicate lines ``attr <op> operand`` with ops ``~= !~= < > <= >=`` over
  the observation attributes (firmware, beconfig, mjd, tbin, freq, bename;
  dlyfix.py:44-79). Predicates are evaluated SEQUENTIALLY: a failed
  predicate sets ``skip=1`` for the remainder of the block, so each action
  is guarded by the conjunction of all predicates ABOVE it (dlyfix.py:43).
  ``~=`` uses ``re.match`` — anchored at the start of the value
  (dlyfix.py:46); ``<``/``>`` are strict, ``<=``/``>=`` inclusive.
- Action lines ``delay (=|+=|-=) value [unit]`` (dlyfix.py:80-122). Unit is
  ``ms``/``us``/``ns`` or the NAME OF AN ATTRIBUTE whose value is the
  conversion factor (``conv=float(getattr(self, elems[3]))``,
  dlyfix.py:95 — e.g. ``delay += 1 tbin``). A block may contain several
  actions; each appends one correction. ``=`` CLEARS all previously
  accumulated corrections — including those from earlier rules
  (``self.corrections=[]``, dlyfix.py:100) — then contributes its own.
- Any other non-empty line prints a warning (dlyfix.py:123-125).

The total correction is the sum of surviving corrections (dlyfix.py:276).

Spark-first (SURVEY.md S12 + J6 + A12 + W4):
- parse → a small ACTIONS DataFrame (one row per delay action, carrying a
  snapshot of the predicates above it; ~10 rows for ptuse.dlycfg) —
  broadcast literal;
- match → broadcast theta join obs × actions on ``forall(preds)`` — each
  predicate struct evaluated against the obs row's attribute columns;
- ordered reduction with reset → a window over action_order per obs: find
  the last matched action with op '=', keep actions >= it, then a plain
  sum of signed ``value * conv`` deltas.

At 100 TB the obs side streams through map tasks; the actions side is a
broadcast literal — the whole evaluation is shuffle-free except the final
per-obs aggregation, which is a partial-agg-friendly groupBy(obs_id).
"""

from __future__ import annotations

import logging
import re

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F, types as T

logger = logging.getLogger(__name__)

_UNIT_SCALE = {"s": 1.0, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}

#: Observation attributes the reference exposes to the DSL (dlyfix.py:13-20).
KNOWN_ATTRS = ("firmware", "beconfig", "mjd", "tbin", "freq", "bename")

PRED_SCHEMA = T.StructType(
    [
        T.StructField("attr", T.StringType()),
        T.StructField("op", T.StringType()),     # ~= !~= < > <= >=
        T.StructField("num", T.DoubleType()),    # numeric operand (comparison ops)
        T.StructField("pat", T.StringType()),    # regex operand (match ops)
    ]
)

RULE_SCHEMA = T.StructType(
    [
        T.StructField("rule_name", T.StringType()),
        T.StructField("rule_order", T.IntegerType()),
        T.StructField("action_order", T.IntegerType()),  # global: reset boundary key
        T.StructField("delay_op", T.StringType()),       # =  +=  -=
        T.StructField("delay_val", T.DoubleType()),
        T.StructField("delay_unit", T.StringType()),     # s|ms|us|ns or attr name
        T.StructField("preds", T.ArrayType(PRED_SCHEMA)),
    ]
)

_HEADER_COMPAT = re.compile(r"^\[(.+)\]$")
_PRED_OPS = ("~=", "!~=", "<=", ">=", "<", ">")


def parse_dlycfg(lines: list[str]) -> list[dict]:
    """Parse the dlyfix rule DSL into ordered action records.

    Faithful to dlyfix.py:27-125 (see module docstring for the grammar).
    Returns one record per DELAY ACTION; each carries ``preds`` — the
    snapshot of predicates parsed above it in its block, so the
    sequential skip semantics reduce to ``all(preds)`` per action.
    Unparseable lines are logged as warnings (dlyfix.py:123-125), never
    silently dropped.
    """
    actions: list[dict] = []
    name: str | None = None
    rule_order = -1
    action_order = 0
    preds: list[dict] = []
    for raw in lines:
        line = raw.split("#", 1)[0]
        elems = line.split()
        if not elems:
            continue
        compat = _HEADER_COMPAT.match(line.strip())
        if elems[0] == "*" or compat:
            # '* name' header (dlyfix.py:38-42); '[name]' compat form.
            name = compat.group(1) if compat else line.strip("* \t\n")
            rule_order += 1
            preds = []
            continue
        if name is None:
            logger.warning("dlycfg: line before any rule header ignored: %r", line.strip())
            continue
        if len(elems) > 2 and elems[0] == "delay" and elems[1] in ("=", "+=", "-="):
            try:
                val = float(elems[2])
            except ValueError:
                logger.warning("dlycfg: bad delay value: %r", line.strip())
                continue
            unit = elems[3] if len(elems) > 3 else "s"
            if unit not in _UNIT_SCALE and unit not in KNOWN_ATTRS:
                logger.warning("dlycfg: unknown unit/attribute %r: %r", unit, line.strip())
                continue
            actions.append(
                {
                    "rule_name": name,
                    "rule_order": rule_order,
                    "action_order": action_order,
                    "delay_op": elems[1],
                    "delay_val": val,
                    "delay_unit": unit,
                    "preds": list(preds),
                }
            )
            action_order += 1
            continue
        if len(elems) > 2 and elems[1] in _PRED_OPS:
            attr, op, operand = elems[0], elems[1], elems[2]
            if op in ("~=", "!~="):
                preds.append({"attr": attr, "op": op, "num": None, "pat": operand})
            else:
                try:
                    preds.append({"attr": attr, "op": op, "num": float(operand), "pat": None})
                except ValueError:
                    logger.warning("dlycfg: bad numeric operand: %r", line.strip())
            continue
        if line.strip():
            logger.warning("dlycfg: cannot understand line: %r", line.strip())
    return actions


def rules_df(spark: SparkSession, actions: list[dict]) -> DataFrame:
    rows = [
        (
            a["rule_name"],
            a["rule_order"],
            a["action_order"],
            a["delay_op"],
            a["delay_val"],
            a["delay_unit"],
            [(p["attr"], p["op"], p["num"], p["pat"]) for p in a["preds"]],
        )
        for a in actions
    ]
    return spark.createDataFrame(rows, RULE_SCHEMA)


def _attr_num(attr: F.Column, attr_cols: dict[str, str]) -> F.Column:
    """CASE over the attribute name → obs column cast to double
    (float(getattr(self, elems[0])), dlyfix.py:57)."""
    expr = F.lit(None).cast("double")
    for name, col in attr_cols.items():
        expr = F.when(attr == name, F.col(col).cast("double")).otherwise(expr)
    return expr


def _attr_str(attr: F.Column, attr_cols: dict[str, str]) -> F.Column:
    """CASE over the attribute name → obs column cast to string
    (str(getattr(self, elems[0])), dlyfix.py:45)."""
    expr = F.lit(None).cast("string")
    for name, col in attr_cols.items():
        expr = F.when(attr == name, F.col(col).cast("string")).otherwise(expr)
    return expr


def evaluate_delay_rules(
    obs: DataFrame,
    rules: DataFrame,
    mjd_col: str = "mjd",
    attr_cols: dict[str, str] | None = None,
    obs_key: str = "obs_id",
) -> DataFrame:
    """J6 theta join + A12 ordered reduction with reset.

    ``rules`` is an actions DataFrame (RULE_SCHEMA). ``attr_cols`` maps
    DSL attribute names to obs column names (``mjd`` is wired from
    ``mjd_col`` automatically). Returns (obs_key, delay_s) with the total
    correction per observation; observations matching no rule get 0.0.

    Semantics matched to dlyfix.py:
    - ``~=`` anchored at value start (re.match, dlyfix.py:46) via
      ``^(?:pat)``;
    - ``<``/``>`` strict, ``<=``/``>=`` inclusive (dlyfix.py:56-79);
    - unit ``ms/us/ns`` fixed scale, otherwise the obs attribute of that
      name is the conversion factor (dlyfix.py:87-95);
    - a matched ``=`` action discards ALL earlier corrections
      (dlyfix.py:100) → max matched '=' action_order is the keep-boundary.
    """
    attrs = {"mjd": mjd_col, **(attr_cols or {})}

    def pred_ok(p: F.Column) -> F.Column:
        num = _attr_num(p["attr"], attrs)
        s = _attr_str(p["attr"], attrs)
        anchored = F.concat(F.lit("^(?:"), p["pat"], F.lit(")"))
        ok = (
            F.when(p["op"] == F.lit("<"), num < p["num"])
            .when(p["op"] == F.lit(">"), num > p["num"])
            .when(p["op"] == F.lit("<="), num <= p["num"])
            .when(p["op"] == F.lit(">="), num >= p["num"])
            .when(p["op"] == F.lit("~="), F.regexp_like(s, anchored))
            .when(p["op"] == F.lit("!~="), ~F.regexp_like(s, anchored))
            .otherwise(F.lit(False))
        )
        return F.coalesce(ok, F.lit(False))

    # Broadcast nested-loop LEFT join: the actions side is a handful of
    # literal rows; every obs row evaluates forall(preds) map-side,
    # shuffle-free, and non-matching observations survive with null
    # action columns (they contribute 0.0 — no separate distinct+backfill
    # join, so the whole evaluation is ONE shuffle: the obs_key window,
    # whose partitioning the final groupBy then reuses).
    matched = obs.join(F.broadcast(rules), F.forall(rules["preds"], pred_ok), "left")

    # Reset boundary: the max action_order among matched '=' actions per
    # obs; earlier corrections are discarded (dlyfix.py:100).
    w = W.partitionBy(obs_key)
    with_reset = matched.withColumn(
        "reset_order",
        F.max(F.when(F.col("delay_op") == "=", F.col("action_order"))).over(w),
    )
    surviving = with_reset.filter(
        F.col("action_order").isNull()
        | F.col("reset_order").isNull()
        | (F.col("action_order") >= F.col("reset_order"))
    )
    conv = F.coalesce(
        *[
            F.when(F.col("delay_unit") == u, F.lit(s))
            for u, s in _UNIT_SCALE.items()
        ],
        _attr_num(F.col("delay_unit"), attrs),
    )
    signed = F.when(F.col("delay_op") == "-=", -F.col("delay_val")).otherwise(
        F.col("delay_val")
    )
    totals = surviving.groupBy(obs_key).agg(
        F.coalesce(F.sum(signed * conv), F.lit(0.0)).alias("delay_s")
    )
    return totals


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
