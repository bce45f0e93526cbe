"""Streaming state-store observability: read a query's STATE as a DataFrame.

Spark 4 exposes every streaming operator's state store as a batch source
(``format("statestore")`` / ``format("state-metadata")`` over the
checkpoint). That turns the opaque part of a streaming pipeline — "what
does the dedup/agg actually remember right now?" — into a queryable table:
the ops pass a production stream runs to audit state size, skewed keys,
and watermark lag without stopping the query.

Scale: the reader plans one partition per state-store partition (the same
layout the stream itself uses), so the audit parallelizes like the stream
and never funnels state through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_aggregation_state(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> DataFrame:
    """Flattened (key columns..., value columns..., partition_id) view of a
    streaming aggregation's state store at the latest committed batch."""
    raw = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .load(checkpoint)
    )
    return raw.select("key.*", "value.*", "partition_id")


def read_state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator-level state metadata: operator name, store name, partition
    count, committed batch range — the first thing an on-call engineer
    asks of a stuck stream."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_key_skew(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> DataFrame:
    """Keys-per-state-partition histogram — state-store skew is the
    streaming twin of shuffle-key skew (one hot key pins one task forever);
    this readout is how it's caught."""
    raw = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .load(checkpoint)
    )
    return (
        raw.groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("partition_id")
    )
