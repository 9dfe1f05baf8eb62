#!/usr/bin/env python3
"""Auto-generate PLANS.md: a physical-plan digest of every headline
query at the bench scale factor — exchange/broadcast/codegen counts and
scan pushdown evidence, so SCALE.md's claims are checkable line by line.

Run: python tools/plan_audit.py  (rewrites PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meerpipe_spark.queries import QUERIES, headline_queries
from meerpipe_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _tree_indent(s: str) -> int:
    n = 0
    for ch in s:
        if ch in " :+-":
            n += 1
        else:
            break
    return n


def strip_initial_plans(plan: str) -> str:
    """Drop '== Initial Plan ==' sections: AQE prints the pre-adaptive
    plan alongside the final one, double-counting every executed node."""
    lines = plan.splitlines()
    out: list[str] = []
    i = 0
    while i < len(lines):
        line = lines[i]
        if "== Initial Plan ==" in line:
            # section children print at indent >= the marker line (the
            # marker's '+- ' counts toward its own tree indent); the
            # section ends at the first strictly-shallower line
            ind = _tree_indent(line)
            j = i + 1
            while j < len(lines) and _tree_indent(lines[j]) >= ind:
                j += 1
            i = j
        else:
            out.append(line)
            i += 1
    return "\n".join(out)


def dedupe_cached(plan: str) -> str:
    """Keep each cached (InMemoryRelation) subtree's text ONCE: every
    InMemoryTableScan consumer re-prints the full cached child plan, so
    a plan with one persisted parent and 7 consumers would count the
    cache-fill exchanges 7× even though they execute once."""
    lines = plan.splitlines()
    out: list[str] = []
    seen: set[str] = set()
    i = 0
    while i < len(lines):
        line = lines[i]
        if "InMemoryRelation" in line:
            ind = _tree_indent(line)
            j = i + 1
            while j < len(lines) and _tree_indent(lines[j]) > ind:
                j += 1
            # key on the RELATION SIGNATURE (output schema + storage
            # level), not the child plan text: AQE re-prints the cached
            # child with progressively finalized query stages, so the
            # same cache's text differs across consumer positions
            key = re.sub(r"#\d+|plan_id=\d+", "", line[_tree_indent(line):])
            if key not in seen:
                seen.add(key)
                out.extend(lines[i:j])
            i = j
        else:
            out.append(line)
            i += 1
    return "\n".join(out)


def find_global_windows(plan: str) -> list[str]:
    """Every `Exchange SinglePartition` whose nearest Window/Sort
    ancestor chain ends in a Window node is a single-partition window —
    the textbook scale-killer. It is ALLOWED only when the subtree
    BELOW the exchange contains a HashAggregate/ObjectHashAggregate/
    SortAggregate before any scan: then the rows funneling through the
    one task are already rollup-sized (group-count, not fact-count).
    Returns a list of verdicts: 'rollup' (allowed) or 'FACT' (a bug).
    """
    lines = plan.splitlines()
    indents = [_tree_indent(ln) for ln in lines]
    verdicts: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        # nearest ancestors: strictly shallower indent, walking upward
        is_window = False
        cur = indents[i]
        for j in range(i - 1, -1, -1):
            if indents[j] < cur:
                cur = indents[j]
                node = lines[j].lstrip(" :+-")
                if node.startswith("Sort "):
                    continue  # the sort the window requires
                is_window = node.startswith(("Window ", "WindowGroupLimit"))
                break
        if not is_window:
            continue  # single-partition agg/limit: partials flow, fine
        # subtree below the exchange: deeper indent until it pops back
        aggregated = False
        for j in range(i + 1, len(lines)):
            if indents[j] <= indents[i]:
                break
            if re.search(r"(HashAggregate|ObjectHashAggregate|SortAggregate)", lines[j]):
                aggregated = True
                break
        verdicts.append("rollup" if aggregated else "FACT")
    return verdicts


def unpersisted_range_exchanges(plan: str) -> int:
    """Count `Exchange rangepartitioning` nodes NOT under a cached
    (InMemoryRelation / InMemoryTableScan / TableCacheQueryStage)
    subtree. Range exchanges sample their input to pick partition
    boundaries, so two ACTIONS over the same un-persisted range
    exchange can see different boundaries (the round-7
    assign_dense_ids silent-wrong-answer class). A cached subtree
    executes once, pinning the boundaries."""
    lines = plan.splitlines()
    indents = [_tree_indent(ln) for ln in lines]
    spans: list[tuple[int, int]] = []  # (start, end) of cached subtrees
    i = 0
    while i < len(lines):
        if re.search(r"InMemoryRelation|InMemoryTableScan|TableCacheQueryStage", lines[i]):
            j = i + 1
            while j < len(lines) and indents[j] > indents[i]:
                j += 1
            spans.append((i, j))
            i = j
        else:
            i += 1
    n = 0
    for i, ln in enumerate(lines):
        if "Exchange rangepartitioning" in ln and not any(
            a <= i < b for a, b in spans
        ):
            n += 1
    return n


#: localCheckpoint calls observed during the CURRENT query's
#: construction (reset per query by the audit loops). Iterative
#: operators (pagerank/lpa/sssp/hits/suffix/CC/kmeans_df) checkpoint
#: each round, which TRUNCATES the audited final plan at a `Scan
#: ExistingRDD` — the per-round shuffles are real and well-shaped
#: (map-side-combined Pregel exchanges) but invisible in the final
#: plan, so a checkpointed query's shuffle count reads artificially
#: low (often 0). The audit counts the checkpoint calls themselves and
#: annotates instead of miscounting (VERDICT r8 item 3). Plan-string
#: detection is NOT possible: a checkpointed scan and a
#: createDataFrame scan both print as `Scan ExistingRDD`.
CKPT_CALLS = {"n": 0}


def install_checkpoint_counter() -> None:
    """Wrap DataFrame.localCheckpoint with a call counter (idempotent).
    Pure observation — arguments and result pass through unchanged.
    Patches the CONCRETE class (pyspark.sql.classic on Spark 4, where
    the public pyspark.sql.DataFrame is an abstract base the instances
    override) as well as the base, so every call path is counted."""
    classes = []
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF  # Spark 4

        classes.append(_CDF)
    except ImportError:
        from pyspark.sql import DataFrame as _DF

        classes.append(_DF)
    for cls in classes:
        if getattr(cls.localCheckpoint, "_plan_audit_wrapped", False):
            continue
        orig = cls.localCheckpoint

        def wrapped(self, *a, _orig=orig, **k):
            CKPT_CALLS["n"] += 1
            return _orig(self, *a, **k)

        wrapped._plan_audit_wrapped = True
        cls.localCheckpoint = wrapped


def digest(plan: str, formatted: str) -> dict[str, object]:
    plan = dedupe_cached(strip_initial_plans(plan))
    gw = find_global_windows(plan)
    return {
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "bnl_joins": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "sort_merge": len(re.findall(r"SortMergeJoin", plan)),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", formatted))),
        "top_k": "TakeOrderedAndProject" in plan,
        "pushed": sorted(set(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)) - {""}),
        "global_window": "FACT" in gw,
        "rollup_windows": gw.count("rollup"),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
    }


def audit_full(spark) -> int:
    """Sweep EVERY registered query (not just headliners) at sf0.01 and
    fail on the two registry-wide anti-patterns the headline audit can
    miss: a single-partition WindowExec fed by fact-table rows, and a
    non-broadcast CartesianProduct. Writes PLANS_full.md (one row per
    query) and returns the number of flagged queries.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_FULL_SF_DIR", "/root/testdata/sf0.01")
    from meerpipe_spark.cacheutil import release_checkpoints, release_persisted

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    install_checkpoint_counter()
    rows, flagged = [], []
    for name, q in QUERIES.items():
        release_persisted()
        release_checkpoints(spark)
        # VERDICT r7 item 7: count CONSTRUCTION-time Spark jobs (an
        # operator that runs actions while building its result — BPE
        # merges, CC fixpoints, per-partition counts). If such an
        # operator ALSO leaves an un-persisted range exchange in the
        # final plan, the construction action and the final action may
        # sample different range boundaries — the assign_dense_ids
        # silent-wrong-answer class. Flag the combination.
        group = f"construct-{name}"
        sc.setJobGroup(group, name)
        CKPT_CALLS["n"] = 0
        df = q.fn(spark, sf_dir)
        n_construct = len(tracker.getJobIdsForGroup(group))
        sc.setJobGroup(f"exec-{name}", name)
        df.count()
        sc.setLocalProperty("spark.jobGroup.id", None)
        qe = df._jdf.queryExecution()
        plan = dedupe_cached(strip_initial_plans(qe.executedPlan().toString()))
        gw = find_global_windows(plan)
        cart = len(re.findall(r"CartesianProduct", plan))
        n_range = unpersisted_range_exchanges(plan)
        multi_action_range = n_construct > 0 and n_range > 0
        bad = "FACT" in gw or cart > 0 or multi_action_range
        if bad:
            flagged.append(name)
        ma = (
            "—" if n_construct == 0
            else (f"⚠jobs={n_construct}+range" if multi_action_range else f"jobs={n_construct} ok")
        )
        n_ck = CKPT_CALLS["n"]
        # per-round construction shuffles hidden behind the checkpoints:
        # every construction job's stage count minus one ≈ its shuffles
        ck_shuf = 0
        if n_ck:
            for jid in tracker.getJobIdsForGroup(group):
                ji = tracker.getJobInfo(jid)
                if ji is not None:
                    ck_shuf += max(0, len(ji.stageIds) - 1)
        shuf_cell = len(re.findall(r"Exchange hashpartitioning", plan))
        rows.append(
            f"| {name} | {f'{shuf_cell} +ckpt×{n_ck}(~{ck_shuf} shuf)' if n_ck else shuf_cell} | "
            f"{len(re.findall(r'BroadcastExchange', plan))} | "
            f"{'⚠FACT' if 'FACT' in gw else ('rollup×%d' % gw.count('rollup') if gw else 'ok')} | "
            f"{'⚠%d' % cart if cart else 'ok'} | {ma} |"
        )
        print(f"{'FLAG' if bad else 'ok  '} {name}")
    out = [
        "# PLANS_full — registry-wide anti-pattern audit "
        "(auto-generated by tools/plan_audit.py --full)",
        "",
        f"Every registered query, AQE-final executed plan at `{sf_dir}`.",
        "'global window' must never read ⚠FACT (single-partition WindowExec",
        "fed by un-aggregated fact rows); 'rollup×N' marks single-partition",
        "windows whose input is already group-count-sized (allowed).",
        "'cartesian' counts non-broadcast CartesianProduct nodes (must be 0).",
        "'multi-action' shows construction-time Spark jobs; ⚠jobs=N+range",
        "flags a construction action combined with an UN-PERSISTED range",
        "exchange in the final plan — two actions may sample different",
        "range boundaries (the r7 assign_dense_ids bug class). Must be 0 ⚠.",
        "'+ckpt×N' in the shuffle column marks N localCheckpoint boundaries",
        "(Scan ExistingRDD): iterative operators checkpoint per round, which",
        "truncates the audited plan — their per-round shuffles are real but",
        "not counted here (audit artifact, not a free operator).",
        "",
        f"**{len(QUERIES)} queries audited, {len(flagged)} flagged"
        + (f": {', '.join(flagged)}" if flagged else "") + ".**",
        "",
        "| query | shuffles | broadcasts | global window | cartesian | multi-action |",
        "|---|---|---|---|---|---|",
        *rows,
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS_full.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"\n{len(QUERIES)} audited, {len(flagged)} flagged: {flagged}")
    return len(flagged)


def main() -> None:
    if "--full" in sys.argv:
        spark = get_spark(app_name="plan_audit_full")
        n = audit_full(spark)
        spark.stop()
        raise SystemExit(1 if n else 0)
    spark = get_spark(app_name="plan_audit")
    rows = []
    install_checkpoint_counter()
    for name in headline_queries():
        CKPT_CALLS["n"] = 0
        df = QUERIES[name].fn(spark, SF_DIR)
        df.count()  # let AQE finalize
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        formatted = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        d = digest(plan, formatted)
        pushed = "; ".join(p[:60] for p in d["pushed"][:2]) or "—"
        shuf = (
            f"{d['shuffles']} +ckpt×{CKPT_CALLS['n']}"
            if CKPT_CALLS["n"]
            else f"{d['shuffles']}"
        )
        rows.append(
            f"| {name} | {shuf} | {d['broadcasts']} | "
            f"{d['sort_merge']} | {'⚠' if d['global_window'] else 'ok'} | "
            f"{'✓' if d['top_k'] else ''} | {pushed} |"
        )
    out = [
        "# PLANS — physical-plan digest of the headline queries "
        "(auto-generated by tools/plan_audit.py)",
        "",
        f"Scale factor dir: `{SF_DIR}`. Counts from the AQE-final executed plan.",
        "Broadcast column counts BroadcastExchange nodes (dims + rule tables);",
        "'top-k' marks TakeOrderedAndProject (per-partition heaps, no global",
    "sort); 'global window' flags any single-partition WindowExec (⚠ = a",
    "scale bug; every row must read 'ok').",
    "'+ckpt×N' marks N localCheckpoint boundaries (Scan ExistingRDD) in",
    "the final plan: the iterative operators (pagerank/lpa/sssp/hits/",
    "suffix/CC) checkpoint each round, which TRUNCATES the audited plan —",
    "their per-round shuffles are real (map-side-combined Pregel",
    "exchanges, one per round) but not visible in this column; a low",
    "count on a +ckpt row is an audit artifact, not a free operator.",
        "",
        "| query | shuffles | broadcasts | sort-merge joins | global window | top-k | pushed filters (sample) |",
        "|---|---|---|---|---|---|---|",
        *rows,
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
