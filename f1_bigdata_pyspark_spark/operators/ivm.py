"""Incremental view maintenance: apply a CDC feed to a materialized
aggregate instead of recomputing it.

The composition the snapshot layer exists for: a 100 TB fact table's
count/sum rollup is maintained by folding ``snapshot_diff``'s change rows
into the existing aggregate — work proportional to the CHANGES, not the
table. Inserts add, deletes subtract, updates contribute (new − old); a
key whose maintained count reaches zero leaves the view. All relational:
one groupBy over the (small) diff plus one full-outer merge join on the
view key — the same exchange budget as MERGE (`operators/merge.py`).

Correctness contract (pinned in tests/test_snapshots.py): after any
sequence of snapshot versions, the maintained view is row-identical to
recomputing the aggregate from the latest snapshot. Exact for count/sum
over integer/decimal columns (the self-maintainable aggregates); min/max
are NOT self-maintainable under deletes and are deliberately absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_of(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """The target view shape: per key, row count and value sum."""
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).cast("long").alias("s"),
    )


def apply_cdc_to_rollup(
    rollup: DataFrame, diff: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Fold a ``snapshot_diff`` change feed into a (key..., n, s) rollup.
    ``diff`` must carry ``change_type`` and both ``old_row``/``new_row``
    payload structs (update deltas need both sides)."""
    is_ins = F.col("change_type") == "insert"
    is_del = F.col("change_type") == "delete"
    newv = F.col("new_row").getField(value_col).cast("long")
    oldv = F.col("old_row").getField(value_col).cast("long")
    delta = diff.groupBy(*key_cols).agg(
        F.sum(
            F.when(is_ins, 1).when(is_del, -1).otherwise(0)
        ).alias("dn"),
        F.sum(
            F.when(is_ins, newv)
            .when(is_del, -oldv)
            .otherwise(newv - oldv)
        ).cast("long").alias("ds"),
    )
    merged = rollup.join(delta, key_cols, "full_outer").select(
        *key_cols,
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias("n"),
        (F.coalesce(F.col("s"), F.lit(0)) + F.coalesce(F.col("ds"), F.lit(0)))
        .cast("long")
        .alias("s"),
    )
    return merged.filter(F.col("n") > 0)
