"""HLL sketch accuracy + mergeability pinned against exact distincts."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY


def test_hll_within_2pct_of_exact(spark, sf_oracle):
    """The declared face emits the tolerance verdicts; assert them true AND
    re-derive the raw estimates inline so a tolerance regression shows the
    actual numbers, not just a false flag."""
    rows = _REGISTRY["hll_users_by_type"].fn(spark, sf_oracle).collect()
    assert rows and all(r.sketch_within_2pct and r.hllpp_within_5pct for r in rows)
    est = {
        r.event_type: (r.approx, r.hllpp, r.n)
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx"),
            F.approx_count_distinct("user_id").alias("hllpp"),
            F.countDistinct("user_id").alias("n"),
        )
        .collect()
    }
    for t, (approx, hllpp, n) in est.items():
        assert abs(approx - n) <= max(1, 0.02 * n), (t, approx, n)
        assert abs(hllpp - n) <= max(1, 0.05 * n), (t, hllpp, n)


def test_sketch_merge_equals_direct_estimate(spark, sf_oracle):
    """Union of daily sketches ≈ exact global distinct — the mergeability
    contract that makes sketch rollup tables work at scale."""
    row = _REGISTRY["sketch_merge_rollup"].fn(spark, sf_oracle).first()
    assert row.n_days >= 1
    assert row.merged_within_2pct
    events = load_table(spark, sf_oracle, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged_est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    ).first().est
    exact = events.agg(F.countDistinct("user_id").alias("n")).first().n
    assert abs(merged_est - exact) <= max(1, 0.02 * exact)


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
