"""Batch MERGE INTO semantics — the three-clause upsert (WHEN MATCHED
UPDATE / WHEN MATCHED DELETE / WHEN NOT MATCHED INSERT) as ONE full-outer
join, no table format required.

The reference's ingestion upsert (``src/ingest/ingest_season_laps.py``
delete-then-append per race) is the two-clause special case; this operator
is the general form a warehouse MERGE statement compiles to when the
target is plain parquet: full-outer join target⋈source on the key, then a
row-wise CASE picks delete / update / insert / keep. Exactly one pass over
each side.

100 TB shape: one co-partitioned key exchange of target and source (the
join); every clause is a narrow projection over the joined row — no second
scan, no driver state. When the source is a small changeset the join
degrades to broadcast under the size policy, making MERGE a map-only
operation over the target — the same plan Delta/Iceberg MERGE produces,
expressed directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    matched_delete: Column | None = None,
    matched_update: dict[str, Column] | None = None,
    update_condition: Column | None = None,
    not_matched_insert: dict[str, Column] | None = None,
) -> DataFrame:
    """Apply MERGE semantics and return the post-merge target table.

    - ``matched_delete``: rows where target and source keys match AND this
      condition holds are deleted (evaluated FIRST, like MERGE clause
      order).
    - ``matched_update``: column -> expression overrides applied to
      surviving matched rows (optionally gated by ``update_condition``).
    - ``not_matched_insert``: column -> expression for source-only rows;
      required for inserts to happen (source rows lacking it are ignored,
      matching MERGE with no NOT MATCHED clause).

    Non-key source columns must not collide with target column names (give
    the changeset its own names, e.g. ``new_price``) — the expressions in
    ``matched_update`` / ``not_matched_insert`` read them off the joined
    row. Output schema == target schema.
    """
    t = target.withColumn("__t", F.lit(1))
    s = source.withColumn("__s", F.lit(1))
    j = t.join(s, on=keys, how="full_outer")

    matched = F.col("__t").isNotNull() & F.col("__s").isNotNull()
    src_only = F.col("__t").isNull() & F.col("__s").isNotNull()

    if matched_delete is not None:
        # NULL delete-condition means NOT deleted (MERGE semantics) — fold
        # the three-valued result to a definite boolean before negating.
        j = j.filter(~F.coalesce(matched & matched_delete, F.lit(False)))

    upd_gate = matched
    if update_condition is not None:
        upd_gate = matched & update_condition

    out = []
    for c in target.columns:
        if c in keys:
            # join(on=keys) already coalesced the key columns
            out.append(F.col(c).alias(c))
            continue
        expr = F.col(c)
        if matched_update and c in matched_update:
            expr = F.when(upd_gate, matched_update[c]).otherwise(expr)
        if not_matched_insert is not None and c in not_matched_insert:
            expr = F.when(src_only, not_matched_insert[c]).otherwise(expr)
        out.append(expr.alias(c))

    merged = j.select(*out, F.col("__t"), F.col("__s"))
    if not_matched_insert is None:
        merged = merged.filter(F.col("__t").isNotNull())
    return merged.drop("__t", "__s")
