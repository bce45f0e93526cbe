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


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Dynamic partition overwrite — the incremental BACKFILL write: only
    the partitions present in ``df`` are replaced; every other partition's
    files are untouched. This is how a restatement lands at 100 TB — a
    recomputed day overwrites exactly that day's directory instead of
    truncating the table (static overwrite) or duplicating rows (append).
    Uses Spark's ``partitionOverwriteMode=dynamic`` session conf, scoped to
    this write and restored after.

    Note the contract difference vs ``upsert_keep_latest``: upsert merges
    at ROW granularity (needs a key); dynamic overwrite replaces at
    PARTITION granularity (needs only the partition columns), which is the
    right tool when the unit of recomputation is a whole partition.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)


def compact_table(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet table into files sized for
    scan efficiency. Returns the number of output files written.

    The file count is derived from the SOURCE's actual on-disk bytes (file
    listing only — no data pass), so compaction cost is one read + one
    write of the table. Small-file proliferation is the classic failure
    mode of incremental ingestion (the reference's per-race upsert batches
    would create one file per race per run); at 100 TB, 1000s of KB-sized
    files turn a scan into a metadata storm — periodic compaction to
    ~128 MB files keeps scan task counts proportional to data, and the
    repartition here is a round-robin exchange, the only shuffle.
    """
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    # listFiles(recursive=True): a Hive-partitioned source keeps its
    # parquet files in SUBDIRECTORIES — the non-recursive listing saw
    # only the dirs, totalled 0 bytes, and compacted any partitioned
    # table into a single giant file. (Note the rewrite itself is flat:
    # compact_table intentionally drops the directory layout; use
    # write_partitioned afterwards to restore one.)
    it = fs.listFiles(jvm_path, True)
    total = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    # Count actual files via the same FileSystem API used for the source —
    # re-reading and counting scan partitions would miscount whenever the
    # scan packs several small files into one partition (maxPartitionBytes)
    # or splits a large file across several.
    dst_jvm = spark._jvm.org.apache.hadoop.fs.Path(dst_path)
    dst_fs = dst_jvm.getFileSystem(spark._jsc.hadoopConfiguration())
    return sum(
        1
        for f in dst_fs.listStatus(dst_jvm)
        if f.getPath().getName().endswith(".parquet")
    )
