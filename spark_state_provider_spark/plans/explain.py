"""Plan-inspection helpers: pull the executed/optimized plan as a string so
tests and the bench can assert physical properties (pushdown, broadcast,
codegen, top-k) instead of eyeballing ``.explain()`` output.
"""

from __future__ import annotations

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
