"""Bucketed co-located joins: the exchange really disappears, and the
answer doesn't change. Complements tests/test_join_policy.py (which covers
the broadcast-vs-shuffle dimension policy); this is the fact⋈fact layout
lever."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.sources.bucketed import (
    colocated_join,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture
def facts(spark):
    orders = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("price"),
    )
    items = spark.range(0, 20000).select(
        (F.col("id") % 5000).alias("k"),
        (F.col("id") % 13).cast("double").alias("qty"),
    )
    return orders, items


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_plans_no_exchange(spark, facts, tmp_path):
    orders, items = facts
    write_bucketed(orders, str(tmp_path / "o"), "t_bucket_o", "k", 8)
    write_bucketed(items, str(tmp_path / "i"), "t_bucket_i", "k", 8)
    # at test scale the planner would broadcast the small side, which
    # hides the layout effect under a BroadcastExchange; disable it so the
    # join takes the sort-merge path a fact⋈fact join takes at 100 TB
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "t_bucket_o", "t_bucket_i", "k").groupBy(
            "k"
        ).agg(F.sum("qty").alias("q"))
        plan = _physical(j)
        assert "Exchange" not in plan, plan
        # baseline sanity: the SAME join from plain parquet reads shuffles
        plain = (
            spark.read.parquet(str(tmp_path / "o"))
            .join(spark.read.parquet(str(tmp_path / "i")), "k")
            .groupBy("k")
            .agg(F.sum("qty").alias("q"))
        )
        assert "Exchange" in _physical(plain)
        # and the answers agree
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_o")
        spark.sql("DROP TABLE IF EXISTS t_bucket_i")


def test_bucketed_aggregation_skips_exchange(spark, facts, tmp_path):
    orders, _ = facts
    write_bucketed(orders, str(tmp_path / "o2"), "t_bucket_o2", "k", 8)
    try:
        agg = read_bucketed(spark, "t_bucket_o2").groupBy("k").agg(
            F.sum("price").alias("p")
        )
        assert "Exchange" not in _physical(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_o2")


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, facts, tmp_path):
    """Safety: a bucket-count mismatch must still produce a correct plan
    (Spark re-shuffles one or both sides) — never a wrong join."""
    orders, items = facts
    write_bucketed(orders, str(tmp_path / "o3"), "t_bucket_o3", "k", 8)
    write_bucketed(items, str(tmp_path / "i3"), "t_bucket_i3", "k", 4)
    try:
        j = colocated_join(spark, "t_bucket_o3", "t_bucket_i3", "k")
        n = j.count()
        assert n == 20000  # every item matches exactly one order key
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_o3")
        spark.sql("DROP TABLE IF EXISTS t_bucket_i3")
