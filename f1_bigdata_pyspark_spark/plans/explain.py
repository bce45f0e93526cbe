"""Physical-plan assertions.

The 100 TB discipline is checkable: filters must reach the parquet scan
(PushedFilters), projections must prune (ReadSchema), small dims must
broadcast (BroadcastHashJoin), and shuffle count must stay constant per
query. These helpers turn ``explain("formatted")`` into testable predicates
so plan regressions fail CI, not production.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_shuffles(df: DataFrame) -> int:
    """Number of distinct Exchange operators in the physical plan (reused
    exchanges don't re-shuffle)."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if ") Exchange" in line or line.strip().startswith("Exchange")
    )


def plan_has(df: DataFrame, needle: str) -> bool:
    return needle in formatted_plan(df)


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError("expected a broadcast join in plan:\n" + plan)


def assert_pushed_filters(df: DataFrame) -> None:
    """At least one scan must push at least one real filter."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "PushedFilters: []" not in line:
            return
    raise AssertionError("no non-empty PushedFilters in plan:\n" + plan)
