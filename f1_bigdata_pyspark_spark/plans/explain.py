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


def oversized_broadcast_inputs(
    df: DataFrame, threshold_bytes: int | None = None
) -> list[tuple[str, int]]:
    """Walk the pre-AQE physical plan and return, for every
    ``BroadcastExchangeExec``, the Catalyst size estimate of the logical
    plan feeding it when that estimate EXCEEDS the broadcast threshold.

    Catalyst's auto-broadcast planner only inserts the exchange when the
    estimate is under ``spark.sql.autoBroadcastJoinThreshold``, so any
    over-threshold entry here comes from an unconditional ``F.broadcast``
    hint — a frame that gets replicated to every executor no matter how
    big it grows at 100x the data. ``operators/join_policy.
    broadcast_if_small`` consults the SAME estimate, so policied joins
    never appear. Returns ``[(node_description, estimated_bytes), ...]``;
    empty list = plan is broadcast-safe under the size policy."""
    from f1_bigdata_pyspark_spark.operators.join_policy import parse_byte_size

    if threshold_bytes is None:
        threshold_bytes = parse_byte_size(
            df.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
        )
    offenders: list[tuple[str, int]] = []
    # exchanges are inserted during executedPlan preparation (sparkPlan has
    # none); under AQE the executed plan is an AdaptiveSparkPlanExec leaf
    # whose pre-execution physical tree is initialPlan
    root = df._jdf.queryExecution().executedPlan()
    if root.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        root = root.initialPlan()
    stack = [root]
    while stack:
        node = stack.pop()
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
        if node.getClass().getSimpleName() != "BroadcastExchangeExec":
            continue
        child = node.children().apply(0)
        link = child.logicalLink()
        if not link.isDefined():
            continue  # no logical origin recorded -> nothing to judge
        size = int(str(link.get().stats().sizeInBytes()))
        if size > threshold_bytes:
            offenders.append((child.nodeName(), size))
    return offenders


def assert_pushed_filters(df: DataFrame) -> None:
    """At least one scan must push at least one real filter."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "PushedFilters: []" not in line:
            return
    raise AssertionError("no non-empty PushedFilters in plan:\n" + plan)
