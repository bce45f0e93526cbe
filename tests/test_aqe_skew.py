"""AQE skew-join: prove Spark's adaptive runtime splits a skewed partition
in a sort-merge join — the engine-native alternative to the explicit
salting in ``operators/skew.py`` (``skew_join_hot_users`` shows the manual
fix; this shows the optimizer doing it, which is what a 100 TB fact⋈fact
with a hot key relies on when the skew is discovered at runtime).

Thresholds are shrunk so a ~200k-row hot key trips the skew detector in
local mode; at production scale the defaults (256 MB advisory partition
size) do the same split on real skew. Both the plan marker (``skew=true``
on the SortMergeJoin) and the unchanged answer are asserted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


HOT = 99  # the hot key


def _skewed_frames(spark):
    # fact: one key owns ~95% of rows
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(HOT))
        .otherwise(F.col("id") % 97)
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    other = spark.range(0, 50_000).select(
        (F.col("id") % 100).alias("k"),
        (F.col("id") % 7).cast("double").alias("w"),
    )
    return fact, other


@pytest.fixture()
def aqe_skew_conf(spark):
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        # the downstream groupBy(k) reuses the join's hash partitioning, and
        # OptimizeSkewedJoin declines to split when that forces an extra
        # exchange — force it (the extra exchange is exactly the trade a
        # real skewed fact join makes)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_partition_and_answer_unchanged(aqe_skew_conf):
    spark = aqe_skew_conf
    fact, other = _skewed_frames(spark)
    joined = (
        fact.join(other, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s"))
    )
    rows = {r["k"]: (r["n"], r["s"]) for r in joined.collect()}

    # the hot key's row count = hot fact rows x matching dim rows
    hot_fact = 200_000 - 200_000 // 20
    hot_dim = 500  # 50k rows % 100 -> 500 per key
    assert rows[HOT][0] == hot_fact * hot_dim

    # after execution the AdaptiveSparkPlan's final plan records the skew
    # split on the SortMergeJoin node
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, final_plan[:2000]

    # cross-check the answer against the same join with AQE skew handling off
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        fact2, other2 = _skewed_frames(spark)
        joined2 = (
            fact2.join(other2, "k")
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s")
            )
        )
        rows2 = {r["k"]: (r["n"], r["s"]) for r in joined2.collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert rows == rows2
