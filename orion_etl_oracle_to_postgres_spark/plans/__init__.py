"""Plan inspection utilities.

The reference has no plan representation beyond its config IR
(SURVEY.md §4); our "plan" is the Catalyst plan itself. These helpers
make scale review part of the workflow: every operator lands with an
``assert_*`` check in tests so a regression that adds an unwanted
shuffle or drops a pushed filter fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of *shuffle* Exchange operators in the physical plan
    (BroadcastExchange doesn't count — broadcasts are the cheap path).
    Counts node headers in the formatted plan's detail section —
    ``(n) Exchange`` — because the partitioning arguments sit on their
    own ``Arguments:`` line, not beside the node name."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange\b", line.strip())
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of a scan — empty string if none."""
    plan = formatted_plan(df)
    return "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
