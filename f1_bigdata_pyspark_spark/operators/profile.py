"""Table profiling — the ANALYZE/data-quality-report face: per-column row
count, null count, distinct count, and min/max, emitted long-form
(one row per column).

Computed in ONE scan: a single wide aggregate produces every column's
statistics, then an unpivot (stack) turns them long-form — the shape that
still works when the table is 100 TB (one pass, partial-aggregated). The
exact distinct counts are the oracle-parity choice; a production profiler
at full scale swaps them for approx_count_distinct sketches column by
column without touching the rest of the shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """Long-form per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_s, max_s) with min/max rendered as strings so heterogeneous column
    types share one schema."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in columns
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_s, max_s)"
        ),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")
