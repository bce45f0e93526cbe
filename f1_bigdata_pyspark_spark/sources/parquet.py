"""Parquet writers reproducing the reference's ingestion semantics.

The reference ingests via Mongo bulk ``UpdateOne(key, {"$set": row},
upsert=True)`` with a unique index on the lap key — i.e. re-run-safe,
keep-latest upsert (reference: ``src/ingest/ingest_season_laps.py:80-108``,
``src/ingest/create_indexes.py:13-23``). Parquet has no transactional merge,
so the equivalent is:

  upsert(existing, batch, key, recency) =
      dropDuplicates-by-key keeping the most recent row, via a partitioned
      row_number — then overwrite.

Scale notes: the window partitions by the upsert key, so state is bounded per
key; output is written partitioned (``partition_cols``) so downstream reads
get partition pruning. On a real deployment this becomes Delta/Iceberg
``MERGE INTO``; the semantics here are identical and engine-native.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert_keep_latest(
    existing: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    recency_col: str,
) -> DataFrame:
    """Merge ``batch`` into ``existing`` keeping, per key, the row with the
    greatest ``recency_col`` (ties → batch wins via a source priority bit).
    Pure DataFrame composition — re-running the same batch is a no-op
    (idempotent, matching the reference's upsert)."""
    batch_tagged = batch.withColumn("__src", F.lit(1))
    if existing is None:
        merged = batch_tagged
    else:
        merged = existing.withColumn("__src", F.lit(0)).unionByName(batch_tagged)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(recency_col).desc(), F.col("__src").desc()
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def assert_unique_key(df: DataFrame, key_cols: list[str]) -> None:
    """The unique-index invariant as a post-write assertion (reference:
    ``create_indexes.py:13-23``; SURVEY.md S5)."""
    dup_count = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    if dup_count:
        raise AssertionError(
            f"unique-key violation: {dup_count} duplicate groups on {key_cols}"
        )


def write_table(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Overwrite-mode write (the reference's truncate-then-load reset,
    ``src/ingest/reset_collection.py:17-18``), optionally partitioned for
    downstream partition pruning."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
