"""Sketch-based approximate aggregates (Apache DataSketches HLL, built into
Spark ≥3.5 as ``hll_sketch_agg``/``hll_union_agg``).

At 100 TB exact COUNT(DISTINCT) is a full shuffle of every distinct value;
an HLL sketch is a few KB per group, map-side combinable, and — the part
that matters operationally — MERGEABLE: per-partition/per-day sketches
union into exact-shape global estimates without touching raw data again.
``sketch_merge_rollup`` demonstrates exactly that pattern (daily sketches →
union → global estimate), the sketch twin of ``events_multires_rollup``.

No SQL oracle: estimates are engine/seed-specific. Accuracy is pinned in
``tests/test_sketches.py`` against the exact distinct (≤2% relative error,
far looser than HLL's actual guarantee at lgK=12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.queries.registry import query


# --------------------------------------------------------------------------
# Q: hll_users_by_type — per-group approximate distinct via HLL sketch,
# alongside HLL++ (approx_count_distinct) for comparison.
# --------------------------------------------------------------------------
@query("hll_users_by_type", oracle=None)
def hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
                "approx_users"
            ),
            F.approx_count_distinct("user_id").alias("hllpp_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: sketch_merge_rollup — build per-day HLL sketches, then MERGE them into
# the global distinct-user estimate. The raw data is scanned once; the
# rollup row is produced purely from the daily sketch table.
# --------------------------------------------------------------------------
@query("sketch_merge_rollup", oracle=None)
def sketch_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_total_users"
        ),
    )
