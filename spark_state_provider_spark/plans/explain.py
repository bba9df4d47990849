"""Plan-inspection helpers: pull the executed/optimized plan as a string so
tests and the bench can assert physical properties (pushdown, broadcast,
codegen, top-k) instead of eyeballing ``.explain()`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (same text ``df.explain`` prints)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = plan_string(df, mode)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}:\n{plan[:4000]}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = plan_string(df, mode)
    present = [n for n in needles if n in plan]
    assert not present, f"plan contains {present}:\n{plan[:4000]}"
    return plan


def _top_level_bracket_groups(s: str) -> list[str]:
    """The ``[...]`` groups at nesting depth 0 in a plan argString."""
    groups: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0 and start >= 0:
                groups.append(s[start + 1 : i])
                start = -1
    return groups


_TREE_PREFIX = re.compile(r"^([ :+|-]*)(.*)$")


def single_partition_findings(
    df: DataFrame | None, plan: str | None = None
) -> list[str]:
    """Scale-killer scan over the physical plan: returns one finding per

    * **global window** — a ``Window`` node with an empty partition spec
      (its argString has two top-level bracket groups, exprs + orderSpec,
      instead of three). Spark moves the node's ENTIRE input to one task.
    * **single-partition exchange** — ``Exchange SinglePartition`` whose
      consumer is not a ``GlobalLimit`` / ``TakeOrdered`` (bounded rows by
      construction) and not a zero-key final aggregate (``keys=[]`` —
      only partial-agg rows, one per upstream partition, are shuffled).

    Empty list ⇒ no corpus-sized data can be forced through one task by
    this plan. Callers with a justified hit (vocab-sized or post-limit
    frames) allowlist by query name, not by weakening the detector.
    """
    if plan is None:
        assert df is not None
        plan = plan_string(df, "simple")
    meta: list[tuple[int, str]] = []
    for ln in plan.splitlines():
        m = _TREE_PREFIX.match(ln)
        assert m is not None
        meta.append((len(m.group(1)), m.group(2)))
    finds: list[str] = []
    for i, (ind, text) in enumerate(meta):
        node = re.sub(r"^\*\(\d+\) ", "", text)  # strip codegen star
        if node.startswith("Window "):
            groups = _top_level_bracket_groups(node)
            # argString is [exprs], [partitionSpec], [orderSpec] with empty
            # specs omitted. Two groups is either global+ordered (second
            # group holds sort orders) or partitioned+unordered (second
            # group holds bare attributes) — only the former is a global
            # window. One group (exprs only) would be global+unordered.
            is_global = len(groups) == 1 or (
                len(groups) == 2
                and re.search(r" (ASC|DESC)\b", groups[1]) is not None
            )
            if is_global:
                # Post-limit frames are bounded by construction: if the
                # window's input subtree contains a global limit, at most
                # k rows reach the single task.
                subtree = []
                for j in range(i + 1, len(meta)):
                    if meta[j][0] <= ind and meta[j][1]:
                        break
                    subtree.append(meta[j][1])
                limited = any(
                    "GlobalLimit" in t
                    or "TakeOrdered" in t
                    or "CollectLimit" in t
                    for t in subtree
                )
                if not limited:
                    finds.append(f"global_window: {node[:140]}")
        elif "Exchange SinglePartition" in node:
            parent = next(
                (
                    meta[j][1]
                    for j in range(i - 1, -1, -1)
                    if meta[j][0] < ind
                ),
                "",
            )
            parent = re.sub(r"^\*\(\d+\) ", "", parent)
            below_limited = False
            for j in range(i + 1, len(meta)):
                if meta[j][0] <= ind and meta[j][1]:
                    break
                if (
                    "GlobalLimit" in meta[j][1]
                    or "TakeOrdered" in meta[j][1]
                    or "CollectLimit" in meta[j][1]
                ):
                    below_limited = True
                    break
            allowed = (
                below_limited
                or "GlobalLimit" in parent
                or "TakeOrdered" in parent
                or "CollectLimit" in parent
                or re.search(r"Aggregate\(key(s)?=\[\]", parent) is not None
            )
            if not allowed:
                finds.append(
                    f"single_partition_exchange under: {parent[:100]}"
                )
    return finds
