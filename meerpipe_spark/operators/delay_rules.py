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

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

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
    rules: DataFrame | list[dict],
    mjd_col: str = "mjd",
    attr_cols: dict[str, str] | None = None,
    obs_key: str = "obs_id",
    unique_keys: bool = False,
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

    # The rule file is tiny by construction (the reference ships ~10
    # rules), so take it driver-side and compile the WHOLE evaluation
    # into literal scalar expressions: every regex is a foldable literal
    # (compiled once by codegen, not per row), there is no join and no
    # window — the rules engine becomes a pure map over the observation
    # stream. Pass the parse_dlycfg output directly (list) to skip the
    # DataFrame roundtrip; a rules DataFrame is also accepted.
    if isinstance(rules, DataFrame):
        actions = rules.orderBy("action_order").collect()
    else:
        actions = sorted(rules, key=lambda a: a["action_order"])

    def q(col: str) -> str:
        return "`" + col.replace("`", "``") + "`"

    def esc(txt: str) -> str:
        return txt.replace("\\", "\\\\").replace("'", "\\'")

    def pred_sql(p) -> str:
        attr = p["attr"]
        if attr not in attrs:
            return "false"
        num = f"CAST({q(attrs[attr])} AS DOUBLE)"
        sv = f"CAST({q(attrs[attr])} AS STRING)"
        if p["op"] in ("<", ">", "<=", ">="):
            return f"coalesce({num} {p['op']} CAST({p['num']!r} AS DOUBLE), false)"
        if p["op"] == "~=":
            # re.match semantics: anchored at the start (dlyfix.py:46)
            return f"coalesce(regexp_like({sv}, '^(?:{esc(p['pat'])})'), false)"
        if p["op"] == "!~=":
            return f"coalesce(NOT regexp_like({sv}, '^(?:{esc(p['pat'])})'), false)"
        return "false"

    # The whole evaluation is compiled to ONE SQL expression string
    # (single expr() parse instead of hundreds of Py4J Column calls —
    # measured ~1s of driver time for a 10-rule file), flat CASE chains
    # only: no array-of-structs machinery (higher-order functions
    # allocate per row and run interpreted lambdas; CASE chains compile
    # into whole-stage codegen).
    oks, contribs = [], []
    for a in actions:
        preds = [pred_sql(p) for p in a["preds"]]
        oks.append("(" + " AND ".join(preds) + ")" if preds else "true")
        unit = a["delay_unit"]
        if unit in _UNIT_SCALE:
            conv = f"CAST({_UNIT_SCALE[unit]!r} AS DOUBLE)"
        elif unit in attrs:
            conv = f"CAST({q(attrs[unit])} AS DOUBLE)"
        else:
            conv = "CAST(NULL AS DOUBLE)"
        signed = -a["delay_val"] if a["delay_op"] == "-=" else a["delay_val"]
        contribs.append(f"(CAST({signed!r} AS DOUBLE) * {conv})")

    if not actions:
        return obs.groupBy(obs_key).agg(F.lit(0.0).alias("delay_s"))

    # Reset boundary: the max action_order among matched '=' actions;
    # earlier corrections are discarded (dlyfix.py:100).
    set_orders = [
        f"CASE WHEN {oks[i]} THEN {a['action_order']} END"
        for i, a in enumerate(actions)
        if a["delay_op"] == "="
    ]
    if len(set_orders) > 1:
        reset = "greatest(" + ", ".join(set_orders) + ")"
    elif set_orders:
        reset = set_orders[0]
    else:
        reset = "CAST(NULL AS INT)"
    terms = []
    for i, a in enumerate(actions):
        keep = f"{oks[i]} AND (_reset IS NULL OR {a['action_order']} >= _reset)"
        terms.append(f"CASE WHEN {keep} THEN {contribs[i]} ELSE CAST(0.0 AS DOUBLE) END")
    per_row_sql = " + ".join(terms)
    per_row = F.expr(per_row_sql)
    if unique_keys:
        # one obs row per key (the normal case: an observation IS a row)
        # -> the engine is a pure map, ZERO shuffles end to end
        obs = obs.withColumn("_reset", F.expr(reset))
        return obs.select(F.col(obs_key), per_row.alias("delay_s"))
    # Grouped path: the reference evaluates '=' resets per OBSERVATION,
    # not per row — a '=' matched on one row clears contributions
    # accumulated from sibling rows of the same obs_key. Take the max
    # reset boundary over a window keyed by obs_key; the window's hash
    # partitioning is reused by the following groupBy (one shuffle total).
    from pyspark.sql import Window as W

    obs = obs.withColumn(
        "_reset", F.max(F.expr(reset)).over(W.partitionBy(obs_key))
    )
    return (
        obs.withColumn("_delay", per_row)
        .groupBy(obs_key)
        .agg(F.sum("_delay").alias("delay_s"))
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
