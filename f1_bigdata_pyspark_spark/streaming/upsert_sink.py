"""foreachBatch idempotent upsert sink — the reference's simulated-velocity
ingestion (per-race batches, bulk keep-latest upserts, unique key —
``ingest_season_laps.py:80-108``, SURVEY.md §2.9/S4) as a NATIVE streaming
sink: every micro-batch merges into the parquet target through
``sources/parquet.upsert_keep_latest``, so replays and overlapping batches
are no-ops per key.

Scale notes: the merge window partitions by the upsert key (state bounded
per key). The read-merge-overwrite cycle materializes the merged table
before overwriting (the overwrite would otherwise destroy its own lazy
input); on a real deployment this whole sink is one Delta/Iceberg
``MERGE INTO`` per micro-batch with no materialize step — semantics
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from f1_bigdata_pyspark_spark.sources.parquet import (
    assert_unique_key,
    upsert_keep_latest,
)
from f1_bigdata_pyspark_spark.utils import fs_path_exists, materialize


def foreach_batch_upsert(target_dir: str, key_cols: list[str], recency_col: str):
    """Build a ``foreachBatch`` function that upserts each micro-batch into
    ``target_dir`` (keep-latest per key) and re-asserts the unique-key
    invariant after every merge."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # EXPLICIT existence probe through the Hadoop FS API (scheme-aware:
        # an os.path probe is driver-local only and reads False forever on
        # hdfs/s3 targets, turning EVERY batch into "first batch" — the
        # overwrite below would then replace the WHOLE accumulated table
        # with one micro-batch). A bare except would be wrong the other
        # way: transient read errors must fail the epoch, not truncate.
        existing = (
            spark.read.parquet(target_dir)
            if fs_path_exists(spark, target_dir)
            else None
        )
        merged = materialize(
            upsert_keep_latest(existing, batch_df, key_cols, recency_col)
        )
        merged.write.mode("overwrite").parquet(target_dir)
        assert_unique_key(spark.read.parquet(target_dir), key_cols)

    return apply


def foreach_batch_snapshot_append(table, app_id: str):
    """``foreachBatch`` sink into a snapshot-versioned table with
    EXACTLY-ONCE semantics on at-least-once replay: each micro-batch
    appends as one atomic snapshot commit stamped ``(app_id, batch_id)``;
    a replayed epoch (checkpoint recovery re-runs the last uncommitted
    batchId) finds its stamp already in a live manifest and publishes
    nothing — Delta's txnAppId/txnVersion protocol on the from-scratch
    snapshot layer. Composes with ``read_changes_since`` downstream: the
    stream lands in a TABLE whose change feed the next pipeline stage
    tails, closing the stream→table→stream loop.

    MULTI-WRITER (round 7): appends publish with ``on_conflict='rebase'``,
    so several streams (distinct ``app_id``s) can sink into ONE table —
    a lost version race republishes the same batch files on the new head
    (appends never conflict logically) and the txn stamp lands on the
    rebased version, keeping each writer's replay-skip check intact."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        last = table.last_committed_batch(app_id)
        if last is not None and batch_id <= last:
            return  # replayed epoch: already durably committed
        table.commit(
            batch_df,
            mode="append",
            txn=(app_id, batch_id),
            on_conflict="rebase",
        )

    return apply
