"""Executable plan policy: the properties SCALE.md promises, as a
library users can assert on THEIR queries before running them at scale.

tests/test_plans.py pins these properties for the shipped queries; this
module exposes the same checks at the API surface, so a pipeline author
gets "this plan would melt at 100 TB" as an exception in CI instead of
a cluster bill. Checks run on the optimized physical plan — nothing is
executed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: plan fragments that are almost never what you want at scale, and why
_FORBIDDEN: tuple[tuple[str, str], ...] = (
    ("CartesianProduct", "unkeyed cross join: O(n·m) row pairs"),
    ("BroadcastNestedLoopJoin", "non-equi join fell back to nested loops"),
)


class PlanPolicyError(AssertionError):
    """A physical plan violates the scale policy."""


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (initial + AQE) as a string."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _single_partition_windows(plan: str) -> bool:
    # a Window whose partition spec is empty sorts the WORLD into one
    # task; the formatted plan prints its required distribution as a
    # SinglePartition exchange feeding a Window node
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if ") Window" in ln or ") WindowGroupLimit" in ln:
            around = "\n".join(lines[max(0, i - 6) : i + 6])
            if "SinglePartition" in around:
                return True
    return False


def check_plan(
    df: DataFrame,
    allow: tuple[str, ...] = (),
    forbid_single_partition_window: bool = True,
) -> None:
    """Raise :class:`PlanPolicyError` when the plan contains a
    scale-hostile shape; return None when clean.

    ``allow`` whitelists fragment names for the rare legitimate case
    (e.g. a documented broadcast-scalar cross join in an eval harness:
    ``allow=("CartesianProduct",)``).
    """
    plan = physical_plan(df)
    problems = []
    for frag, why in _FORBIDDEN:
        if frag in plan and frag not in allow:
            problems.append(f"{frag}: {why}")
    if forbid_single_partition_window and _single_partition_windows(plan):
        problems.append(
            "Window over SinglePartition: the whole input sorts into one task"
        )
    if problems:
        raise PlanPolicyError(
            "plan violates scale policy:\n- " + "\n- ".join(problems)
        )
