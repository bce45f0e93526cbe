"""State-store reader: streaming state is queryable and equals the batch
twin of the same aggregation, across multiple micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.streaming.state_audit import (
    read_aggregation_state,
    read_state_metadata,
    state_key_skew,
)


def _write_batch(spark, src, lo, hi):
    (
        spark.range(lo, hi)
        .select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
        .write.mode("append")
        .parquet(src)
    )


def _run_stream_once(spark, src, ckpt):
    q = (
        spark.readStream.schema("k long, v long")
        .parquet(src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_state_equals_batch_recompute_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    _write_batch(spark, src, 0, 100)
    _run_stream_once(spark, src, ckpt)

    def batch_twin():
        return {
            (r.k): (r.n, r.s)
            for r in spark.read.parquet(src)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect()
        }

    def state_view():
        # the store's value schema uses the PHYSICAL accumulator names
        # (count, sum), not the query aliases
        return {
            (r.k): (r["count"], r["sum"])
            for r in read_aggregation_state(spark, ckpt).collect()
        }

    assert state_view() == batch_twin()

    # second micro-batch advances the SAME state (not a fresh store)
    _write_batch(spark, src, 100, 250)
    _run_stream_once(spark, src, ckpt)
    assert state_view() == batch_twin()

    md = read_state_metadata(spark, ckpt).collect()
    assert md[0].operatorName == "stateStoreSave"
    assert md[0].maxBatchId == 1  # two committed batches: 0 and 1

    skew = {r.partition_id: r.n_keys for r in state_key_skew(spark, ckpt).collect()}
    assert sum(skew.values()) == 7  # 7 distinct keys across partitions
