"""Physical-layout scale proofs: partition pruning and bucketed (co-located)
joins. These are the two layout levers that matter most at 100 TB — a
partition-pruned scan reads 1/N of the files, and a bucketed join removes
the fact-table shuffle entirely. Both are asserted on the real plan, not
assumed.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.plans.explain import count_shuffles, formatted_plan
from f1_bigdata_pyspark_spark.sources.parquet import write_table


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="scale_layout_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes(spark, sf_smoke, tmpdir):
    orders = load_table(spark, sf_smoke, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = f"{tmpdir}/orders_by_year"
    write_table(orders, path, partition_cols=["o_year"])

    pruned = spark.read.parquet(path).filter(F.col("o_year") == 1997)
    plan = formatted_plan(pruned)
    # the year predicate must be a PartitionFilter on the scan (directory
    # pruning), not a post-scan Filter over all files
    assert "PartitionFilters" in plan
    line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "o_year" in line, plan
    # and the result matches the unpartitioned filter
    want = orders.filter(F.col("o_year") == 1997).count()
    assert pruned.count() == want


def test_bucketed_join_no_fact_shuffle(spark, sf_smoke, tmpdir):
    """Pre-bucketing both sides on the join key removes every Exchange from
    the join plan — the co-located join a 100 TB fact⋈fact needs."""
    li = load_table(spark, sf_smoke, "lineitem")
    orders = load_table(spark, sf_smoke, "orders")
    (
        li.write.mode("overwrite")
        .option("path", f"{tmpdir}/li_bucketed")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .option("path", f"{tmpdir}/orders_bucketed")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    lib = spark.table("li_bucketed")
    orb = spark.table("orders_bucketed")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            lib.join(orb, lib.l_orderkey == orb.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = formatted_plan(joined)
        # bucketed sort-merge join: both scans read buckets, neither join
        # side shuffles — the only exchange is the final small aggregation
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Bucketed: true") == 2, plan
        assert count_shuffles(joined) <= 1, plan
        # correctness unchanged vs the plain join
        want = {
            tuple(r)
            for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {tuple(r) for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_zorder_layout_clusters_both_dimensions(spark, sf_smoke):
    """The Z-order claim, quantified: per-64-row-group (size span × price
    span) area under the Morton sort must be far below the same metric
    under natural (p_partkey) order — i.e., the layout actually co-locates
    rows in BOTH dimensions, which is what makes row-group min/max stats
    prunable on either predicate."""
    from pyspark.sql import Window, functions as F

    from f1_bigdata_pyspark_spark.catalog import load_table
    from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY

    z = _REGISTRY["zorder_part_layout"].fn(spark, sf_smoke)
    z_area = (
        z.select(
            (
                (F.col("size_max") - F.col("size_min") + 1)
                * (F.col("price_max") - F.col("price_min") + 1)
            ).alias("area")
        )
        .agg(F.avg("area"))
        .first()[0]
    )
    part = load_table(spark, sf_smoke, "part")
    nat = part.select(
        "p_size",
        F.floor(F.col("p_retailprice") / 40.0).cast("int").alias("pb"),
        ((F.row_number().over(Window.orderBy("p_partkey")) - 1) / 64)
        .cast("int")
        .alias("rg"),
    )
    nat_area = (
        nat.groupBy("rg")
        .agg(
            (
                (F.max("p_size") - F.min("p_size") + 1)
                * (F.max("pb") - F.min("pb") + 1)
            ).alias("area")
        )
        .agg(F.avg("area"))
        .first()[0]
    )
    assert z_area * 2 < nat_area, (z_area, nat_area)


def test_bloom_prefilter_join_is_exact(spark, sf_smoke):
    """The exact join after the bloom pass removes every false positive:
    the aggregated item count equals the true semi-join count (the
    no-false-negatives side is property-tested in test_properties.py)."""
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.catalog import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    orders = load_table(spark, sf_smoke, "orders")
    urgent = orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    true_match = li.join(
        urgent, urgent.o_orderkey == li.l_orderkey, "left_semi"
    ).count()
    from f1_bigdata_pyspark_spark.queries.extended import bloom_prefilter_revenue

    agg = bloom_prefilter_revenue(spark, sf_smoke)
    n_after_join = agg.agg(F.sum("n_items")).first()[0]
    assert n_after_join == true_match


def test_aqe_splits_skewed_join_partition(spark, tmpdir):
    """AQE's runtime skew-join handling is the OTHER half of the skew story
    (operators/skew covers the planned mitigations): a fact⋈fact sort-merge
    join where one key holds most rows must get its oversized partition
    split at runtime — asserted on the adaptive plan's `skew=true` marker,
    with results identical to the unskewed plan. At 100 TB this is the
    mitigation that needs NO code change, which is why the thresholds are
    session confs — tuned low here so a local-mode fixture can trip it."""
    from pyspark.sql import functions as F

    # 1M-row hot key with an incompressible payload: the skew detector
    # compares COMPRESSED shuffle-partition bytes against the threshold, so
    # a constant/cyclic payload lz4-compresses below any realistic
    # threshold and never trips it
    n_hot, n_cold = 1_000_000, 1_000
    fact = spark.range(n_hot + n_cold).select(
        F.when(F.col("id") < n_hot, 0).otherwise(F.col("id")).alias("k"),
        F.xxhash64("id").alias("v"),
    )
    # one row per key — precomputed to parquet so BOTH join inputs are bare
    # shuffled scans: OptimizeSkewedJoin only matches
    # SMJ(sort(shuffle), sort(shuffle)); an aggregate between sort and
    # shuffle on either side disqualifies the rewrite
    dim = spark.range(n_hot + n_cold).select(
        F.col("id").alias("k"), F.xxhash64("id").alias("w")
    ).filter((F.col("k") == 0) | (F.col("k") >= n_hot))
    fact.write.mode("overwrite").parquet(f"{tmpdir}/skew_fact")
    dim.write.mode("overwrite").parquet(f"{tmpdir}/skew_dim")
    f1 = spark.read.parquet(f"{tmpdir}/skew_fact")
    f2 = spark.read.parquet(f"{tmpdir}/skew_dim")

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = f1.join(f2, "k").groupBy("v").agg(F.count(F.lit(1)).alias("n"))
        rows = {tuple(r) for r in joined.collect()}
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan
        assert "AQEShuffleRead skewed" in final_plan, final_plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
    # results identical without any of the skew machinery
    want = {tuple(r) for r in joined.collect()}
    assert rows == want


def test_sf_scaling_sub_quadratic(spark):
    """Anti-all-pairs regression gate: the most data-bound headline queries
    must scale sub-quadratically from sf0.01 to sf0.1 (10× the data). An
    accidental all-pairs path (the LSH/Jaccard family is one refactor away
    from one) shows up as ~100×; the bound here is a generous 50× so
    hypervisor noise cannot flake the suite — bench.py --sweep reports the
    precise per-query ratios (typically <6×).
    """
    import time

    from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY

    testdata = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    dirs = (f"{testdata}/sf0.01", f"{testdata}/sf0.1")

    def best_of_two(fn, d):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, d).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in ("pricing_summary", "dedup_keep_first", "minhash_lsh_candidates"):
        fn = _REGISTRY[name].fn
        t_small = best_of_two(fn, dirs[0])
        t_big = best_of_two(fn, dirs[1])
        ratio = t_big / max(t_small, 1e-9)
        assert ratio < 50, (name, round(t_small, 3), round(t_big, 3), ratio)
