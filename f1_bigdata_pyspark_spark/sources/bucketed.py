"""Bucketed tables: co-located joins and aggregations with NO exchange.

The one shuffle-elimination technique the repo argued in prose (SCALE.md's
"pre-partitioning / bucketing" rows) but never demonstrated. Bucketing
hash-partitions data ON DISK at write time: every file belongs to exactly
one bucket of the join key, so a join (or aggregation) keyed on the bucket
column starts from a layout that already satisfies the exchange
requirement — Spark plans SortMergeJoin with ZERO ShuffleExchange on the
bucketed side(s). At 100 TB this is the difference between re-shuffling
both fact tables on every run and shuffling each exactly once, at ingest.

Mechanics (all public Spark):
- ``bucketBy(n, key)`` is only available on ``saveAsTable`` (the bucket
  spec lives in the catalog, not the parquet footer). The warehouse dir is
  a STATIC conf, so tables are written EXTERNAL via ``.option("path", …)``
  — the files land where the caller says, the catalog entry carries the
  bucket metadata.
- Both sides of a co-located join must agree on bucket count and key.
- ``sortBy`` additionally pre-sorts within buckets, removing the join's
  per-task sort at read time.

Reference analog: none (the reference's store hash-shards on _id — this
is the same idea surfaced as a first-class relational layout).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external parquet table bucketed (and optionally
    sorted) by ``key``. Replaces the catalog entry if it exists (the files
    are external — a dropped entry never deletes data, so the path must be
    fresh per write)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (
        df.write.mode("overwrite")
        .option("path", os.path.abspath(path))
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the ONLY way the bucket layout reaches the planner
    (a plain ``spark.read.parquet(path)`` of the same files forgets the
    bucketing and re-shuffles)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket specs the physical plan contains NO ShuffleExchange — asserted
    in tests/test_bucketed.py."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key
    )
