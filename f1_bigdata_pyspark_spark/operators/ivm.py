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
            # NULL-safe deltas: sum() skips NULL rows in a recompute, so a
            # value transitioning to/from NULL must contribute exactly the
            # non-NULL side — `newv - oldv` would be NULL and silently
            # skip the WHOLE delta, diverging the maintained view
            F.when(is_ins, F.coalesce(newv, F.lit(0)))
            .when(is_del, -F.coalesce(oldv, F.lit(0)))
            .otherwise(
                F.coalesce(newv, F.lit(0)) - F.coalesce(oldv, F.lit(0))
            )
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


# -- round 10: maintenance from the ROW-LEVEL change feed --------------------
# ``snapshots.read_row_changes_since`` emits (row columns, _change_type,
# _commit_version) across the FULL DML matrix — deletes and updates
# included — so these folds are what replace the "full resync at the
# first GDPR delete" failure mode the key-diff feed (snapshot_diff) had.


def signed_delta_from_row_feed(feed: DataFrame) -> DataFrame:
    """A row-level change feed as a ±1-signed multiset delta relation:
    insert/update_postimage contribute (+1, row), delete/update_preimage
    (−1, row). The output shape plugs straight into the round-7 join-
    maintenance identity (``apply_cdc_to_join_rollup``)."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    return feed.withColumn("__sign", sign).drop(
        "_change_type", "_commit_version"
    )


def apply_row_feed_to_rollup(
    rollup: DataFrame, feed: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Fold a row-level change feed into a (key..., n, s) rollup — the
    single-table IVM step, now across deletes/updates: one groupBy over
    the (small) feed plus the same full-outer merge as the CDC fold.
    NULL values contribute 0 to the sum on either sign, matching what a
    recompute's ``sum()`` would skip."""
    d = signed_delta_from_row_feed(feed)
    v = F.coalesce(F.col(value_col).cast("long"), F.lit(0))
    delta = d.groupBy(*key_cols).agg(
        F.sum("__sign").alias("dn"),
        F.sum(F.col("__sign") * v).cast("long").alias("ds"),
    )
    merged = rollup.join(delta, key_cols, "full_outer").select(
        *key_cols,
        (
            F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("s"), F.lit(0)) + F.coalesce(F.col("ds"), F.lit(0))
        )
        .cast("long")
        .alias("s"),
    )
    return merged.filter(F.col("n") > 0)


# -- round 7: JOIN-view maintenance (two-table delta-join identity) ----------


def signed_delta(diff: DataFrame, key_cols: list[str]) -> DataFrame:
    """A ``snapshot_diff`` change feed as a ±1-SIGNED multiset delta
    relation ΔX = X_new − X_old: inserts contribute (+1, new row),
    deletes (−1, old row), updates BOTH (−1 old, +1 new). Signed deltas
    are what make join maintenance linear algebra instead of case
    analysis — joins of signed relations multiply signs, unions add."""
    plus = diff.filter(F.col("change_type").isin("insert", "update")).select(
        *key_cols, F.col("new_row.*"), F.lit(1).alias("__sign")
    )
    minus = diff.filter(F.col("change_type").isin("delete", "update")).select(
        *key_cols, F.col("old_row.*"), F.lit(-1).alias("__sign")
    )
    return plus.unionByName(minus)


def join_rollup_of(
    a: DataFrame,
    b: DataFrame,
    join_keys: list[str],
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """The two-table view shape: per group, row count and value sum over
    the a⋈b equi-join — the fact⋈dim (or pre-aggregated fact⋈fact)
    rollup a pipeline would otherwise recompute nightly."""
    return (
        a.join(b, join_keys)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).cast("long").alias("s"),
        )
    )


def apply_cdc_to_join_rollup(
    rollup: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    delta_a: DataFrame,
    delta_b: DataFrame,
    join_keys: list[str],
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Maintain a ``join_rollup_of`` view from CDC feeds of BOTH inputs —
    the standard delta-join identity on signed multisets:

        Δ(A⋈B) = ΔA⋈B_old  ∪  A_old⋈ΔB  ∪  ΔA⋈ΔB

    (expand (A_old+ΔA)⋈(B_old+ΔB) and cancel A_old⋈B_old; signs multiply
    through the join). Each joined delta row contributes ``sign`` to the
    group count and ``sign·value`` to the sum; one small groupBy over the
    union folds into the view with the same full-outer merge as the
    single-table path. Work ∝ changes: the two terms touching an OLD
    snapshot join a small signed changeset against it — under the size
    policy that's a broadcast of the changeset (map-only over the old
    table's relevant files, stats-prunable on the join key at a real
    table format), never a re-aggregation of A⋈B. ``delta_a`` /
    ``delta_b`` are ``signed_delta`` frames; their non-sign columns must
    match a_old / b_old."""
    sa = F.col("__sign_a")
    sb = F.col("__sign_b")
    da = delta_a.withColumnRenamed("__sign", "__sign_a")
    db = delta_b.withColumnRenamed("__sign", "__sign_b")
    t1 = da.join(b_old, join_keys).select(
        *group_cols, F.col(value_col).alias("__v"), sa.alias("__w")
    )
    t2 = a_old.join(db, join_keys).select(
        *group_cols, F.col(value_col).alias("__v"), sb.alias("__w")
    )
    t3 = da.join(db, join_keys).select(
        *group_cols, F.col(value_col).alias("__v"), (sa * sb).alias("__w")
    )
    delta = (
        t1.unionByName(t2)
        .unionByName(t3)
        .groupBy(*group_cols)
        .agg(
            F.sum("__w").alias("dn"),
            F.sum(F.col("__w") * F.col("__v")).cast("long").alias("ds"),
        )
    )
    merged = rollup.join(delta, group_cols, "full_outer").select(
        *group_cols,
        (
            F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("s"), F.lit(0)) + F.coalesce(F.col("ds"), F.lit(0))
        )
        .cast("long")
        .alias("s"),
    )
    return merged.filter(F.col("n") > 0)
