"""Size-aware dimension-join policy (operators/join_policy).

The scale contract: dimensions are broadcast only while Catalyst's size
estimate is under spark.sql.autoBroadcastJoinThreshold. A customer table
that is a broadcast dim at sf0.1 is a 15M-row shuffle join at sf100 — the
policy, not the query author, must make that call. These tests pin both
directions: under the threshold the plan keeps BroadcastHashJoin; with
broadcasting disabled the same query compiles to SortMergeJoin (the
co-partitioned shuffle join) and produces IDENTICAL results.
"""

from __future__ import annotations

import pytest

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.operators.join_policy import (
    broadcast_if_small,
    estimated_size_bytes,
    parse_byte_size,
)
from f1_bigdata_pyspark_spark.plans.explain import formatted_plan
from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY


def test_parse_byte_size():
    assert parse_byte_size("10485760") == 10 * 1024 * 1024
    assert parse_byte_size("10MB") == 10 * 1024 * 1024
    assert parse_byte_size("1g") == 1 << 30
    assert parse_byte_size("512b") == 512
    assert parse_byte_size("-1") == -1
    with pytest.raises(ValueError):
        parse_byte_size("10xx")


def test_estimated_size_tracks_file_bytes(spark, sf_smoke):
    # For a bare parquet scan the estimate is the on-disk footprint —
    # customer is strictly bigger than nation at every SF.
    cust = estimated_size_bytes(load_table(spark, sf_smoke, "customer"))
    nat = estimated_size_bytes(load_table(spark, sf_smoke, "nation"))
    assert cust > nat > 0


def test_policy_discriminates_by_size(spark, sf_smoke):
    customer = load_table(spark, sf_smoke, "customer")
    nation = load_table(spark, sf_smoke, "nation")
    cust_size = estimated_size_bytes(customer)
    nat_size = estimated_size_bytes(nation)
    # threshold between the two sizes: nation broadcast, customer not
    mid = (cust_size + nat_size) // 2
    assert nat_size < mid < cust_size
    hinted = broadcast_if_small(nation, threshold_bytes=mid)
    unhinted = broadcast_if_small(customer, threshold_bytes=mid)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in unhinted._jdf.queryExecution().analyzed().toString()


def _with_conf(spark, key, value):
    class _Ctx:
        def __enter__(self):
            self.old = spark.conf.get(key)
            spark.conf.set(key, value)

        def __exit__(self, *a):
            spark.conf.set(key, self.old)

    return _Ctx()


@pytest.mark.parametrize("qname", ["revenue_by_nation", "two_level_avg"])
def test_customer_join_degrades_to_shuffle_join(spark, sf_smoke, qname):
    """With broadcasting disabled the policy must NOT force a broadcast:
    the customer join has to compile to SortMergeJoin, and the answer must
    not change."""
    fn = _REGISTRY[qname].fn
    baseline = sorted(tuple(r) for r in fn(spark, sf_smoke).collect())
    with _with_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        df = fn(spark, sf_smoke)
        plan = formatted_plan(df)
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        got = sorted(tuple(r) for r in df.collect())
    # sorted: these queries dropped their trailing display orderBy in r11
    # (the correctness gate hashes order-insensitively), so the two plans
    # may legitimately emit rows in different orders
    assert got == baseline


def test_customer_join_broadcasts_under_default_threshold(spark, sf_smoke):
    """At small SF the same query keeps the broadcast plan — the policy only
    degrades when the dim outgrows the threshold."""
    df = _REGISTRY["revenue_by_nation"].fn(spark, sf_smoke)
    assert "BroadcastHashJoin" in formatted_plan(df)


def test_skew_join_routes_hot_keys_through_broadcast(spark, sf_smoke):
    """The skewed-join split must keep its SHAPE with auto-broadcast
    disabled: the hot-key branch is an explicit broadcast (its dim slice is
    bounded by the hot-key count), the cold branch degrades to a shuffle
    join, and the two unite. Results must equal the plain-join baseline."""
    fn = _REGISTRY["skew_join_hot_users"].fn
    baseline = [tuple(r) for r in fn(spark, sf_smoke).collect()]
    with _with_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        df = fn(spark, sf_smoke)
        plan = formatted_plan(df)
        assert "BroadcastHashJoin" in plan, plan  # hot branch: explicit hint
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Union" in plan, plan
        got = [tuple(r) for r in df.collect()]
    assert got == baseline
