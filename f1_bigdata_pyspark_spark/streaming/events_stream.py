"""Structured Streaming equivalents of the events-table analytics.

The reference simulates streaming with incremental idempotent batch upserts
(reference: ``README.md:24-27``, ``ingest_season_laps.py:121-147``;
SURVEY.md §2.9). Here the same semantics are expressed natively:

- file-source stream (``maxFilesPerTrigger``) over the events parquet,
- watermark + ``dropDuplicates`` on the event key = the unique-index upsert,
- watermark + tumbling-window aggregation = the hourly rollup
  (identical results to the batch ``events_hourly`` query — asserted in
  tests via the foreachBatch/memory sink).

Scale notes: watermark bounds state; the windowed agg is partial-aggregated
before the shuffle exactly like its batch twin. ``availableNow`` triggers
give batch-equivalent replay for backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import SCHEMAS
from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over the events table. Timestamp decoding matches
    the batch loader: the footer is sniffed, and only a ns-encoded file takes
    the legacy raw-nanos path with exact integer division (the regenerated
    testdata is plain micros and reads with the declared schema).

    The file source requires a *directory*; the testdata table is a single
    parquet file, so it is staged into a temp dir via symlink (zero-copy)."""
    import os
    import tempfile

    from f1_bigdata_pyspark_spark.catalog import _events_ts_unit

    stage_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(stage_dir, "events.parquet"),
    )
    if _events_ts_unit(sf_dir) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = (
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(stage_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage_dir)
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming unique-key dedup — the reference's unique-index upsert
    (S4/S5) as a native streaming operator. Uses
    ``dropDuplicatesWithinWatermark`` so the dedup STATE is actually
    evicted past the watermark: plain ``dropDuplicates(['event_id'])``
    keys state by event_id alone and Spark never evicts it (the
    event-time column isn't in the subset) — unbounded state on an
    unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming tumbling-window rollup; late rows beyond the watermark are
    dropped, everything else matches the batch events_hourly query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def enrich_stream(events: DataFrame, dim: DataFrame, key_col: str) -> DataFrame:
    """Stream–static enrichment join: each micro-batch of the stream joins
    the static dimension — the standard pattern for attaching
    slowly-changing reference data to an event stream without any stateful
    join machinery. The static side is planned per micro-batch, so a
    refreshed dim table is picked up on the next trigger.

    Scale notes: the dim side is broadcast iff its size estimate is under
    the session broadcast threshold (see operators/join_policy) — under it
    the stream side never shuffles for this join; over it the join degrades
    to a shuffle join per micro-batch, which is survivable where an
    oversized broadcast is not. State is zero because the static side is
    not a stream."""
    return events.join(broadcast_if_small(dim), events["user_id"] == dim[key_col], "left")


def run_to_memory(
    stream_df: DataFrame,
    table_name: str,
    output_mode: str = "append",
    timeout_s: int = 120,
):
    """Drive a streaming query to completion with availableNow (process all
    available input, then stop) into an in-memory sink; returns the query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()  # a silent partial memory table is worse than failing
        raise TimeoutError(
            f"streaming query {table_name!r} did not finish within "
            f"{timeout_s}s"
        )
    return q


def session_rollup_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming gap-based sessionization — the native stateful twin of the
    batch ``user_sessions`` query (``queries/sessions.py``): Spark merges
    events within ``gap`` of each other into one session window per user.

    State is scoped per user_id partition (same single-shuffle layout as the
    batch lag/sum form); with a watermark the session state is bounded and
    evicted once the watermark passes a session's close."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def click_purchase_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream–stream interval join: each click joins purchases by the same
    user landing within ``horizon`` AFTER the click. Both sides carry
    watermarks and the join predicate carries the time bound — together
    they let Spark expire join state (a click older than watermark+horizon
    can never match a future purchase), which is what makes a stream–stream
    join runnable forever at scale instead of accumulating unbounded state.

    Scale notes: state is hash-partitioned by user_id (the equi-key); the
    per-key state size is bounded by the horizon window, independent of
    stream length. The batch twin (same join predicate on the static table)
    must produce the identical row set — pinned in tests."""
    c = (
        clicks.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        F.round("amount", 2).alias("amount"),
    )


# ---------------------------------------------------------------- sketches
CM_DEPTH, CM_WIDTH = 3, 64  # same geometry as queries/sketches countmin


def countmin_partial(df: DataFrame, key_col: str) -> DataFrame:
    """(r, col, cnt) Count-Min partial for one batch of keys — the same
    portable md5 row-hash as the batch face (queries/sketches), so
    partials from any engine/epoch merge by plain addition."""
    from f1_bigdata_pyspark_spark.functions.text import md5_long

    probes = df.select(
        F.col(key_col).alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("r"),
    ).select(
        "r",
        (
            md5_long(F.concat_ws("#", F.col("k"), F.col("r").cast("string")))
            % CM_WIDTH
        ).alias("col"),
    )
    return probes.groupBy("r", "col").agg(F.count(F.lit(1)).alias("cnt"))


def foreach_batch_countmin_append(root: str, key_col: str):
    """Exactly-once streaming maintenance of an ADDITIVE sketch without
    read-modify-write: each micro-batch OVERWRITES its own partial at
    ``root/batch-{id}`` (replay after a checkpoint rollback rewrites the
    identical bytes — idempotent by construction), and the merged sketch
    is a pure fold over the partials (``read_countmin``). This is the
    commutative-monoid pattern every mergeable summary (CM, HLL, KMV,
    bottom-k) gets for free: no transactional register, no lost-update
    window, batch cost independent of history length. At 100 TB a
    compaction pass folds old partials into coarser epochs; the fold
    result is identical by associativity."""

    def write_partial(batch_df: DataFrame, batch_id: int) -> None:
        countmin_partial(batch_df, key_col).write.mode("overwrite").parquet(
            f"{root}/batch-{batch_id}"
        )

    return write_partial


def read_countmin(spark: SparkSession, root: str) -> DataFrame:
    """Merged (r, col, cnt) Count-Min table = sum over all epoch partials.

    The partials are discovered with a Hadoop-FS path glob (``batch-*``)
    rather than a driver-local ``glob.glob`` so the same code works on an
    object store; before any micro-batch has committed a partial the fold
    is the empty sketch, not an AnalysisException."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(f"{root}/batch-*")
    except AnalysisException:
        return spark.createDataFrame([], "r INT, col BIGINT, cnt BIGINT")
    return df.groupBy("r", "col").agg(F.sum("cnt").alias("cnt"))
