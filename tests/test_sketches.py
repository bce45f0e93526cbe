"""HLL sketch accuracy + mergeability pinned against exact distincts."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY


def test_hll_within_2pct_of_exact(spark, sf_oracle):
    got = {
        r.event_type: (r.approx_users, r.hllpp_users)
        for r in _REGISTRY["hll_users_by_type"].fn(spark, sf_oracle).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, n in exact.items():
        approx, hllpp = got[t]
        assert abs(approx - n) <= max(1, 0.02 * n), (t, approx, n)
        assert abs(hllpp - n) <= max(1, 0.05 * n), (t, hllpp, n)


def test_sketch_merge_equals_direct_estimate(spark, sf_oracle):
    """Union of daily sketches ≈ exact global distinct — the mergeability
    contract that makes sketch rollup tables work at scale."""
    row = _REGISTRY["sketch_merge_rollup"].fn(spark, sf_oracle).first()
    exact = (
        load_table(spark, sf_oracle, "events")
        .agg(F.countDistinct("user_id").alias("n"))
        .first()
        .n
    )
    assert row.n_days >= 1
    assert abs(row.approx_total_users - exact) <= max(1, 0.02 * exact)


def test_portable_hll_accuracy(spark, sf_oracle):
    """The portable HLL estimate stays within 5% of the exact distinct
    (256 registers -> ~6.5% theoretical RSE; the fixture's per-type
    cardinality sits in the linear-counting regime, which is tighter)."""
    from f1_bigdata_pyspark_spark.catalog import load_table
    from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY

    got = {
        r["event_type"]: r["hll_estimate"]
        for r in _REGISTRY["portable_hll_users_by_type"].fn(
            spark, sf_oracle
        ).collect()
    }
    from pyspark.sql import functions as F

    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, n in exact.items():
        rel_err = abs(got[et] - n) / n
        assert rel_err <= 0.05, (et, got[et], n, rel_err)
