"""Reference-parity queries (SURVEY.md §2 operator inventory).

Each query re-expresses one reference analytic shape over the driver's
synthetic star schema. Reference citations are on each function. Rounding
discipline: sums of money → 2 dp, averages/ratios/slopes → 6 dp, stddev → 4
dp — applied identically in the Spark plan and the DuckDB oracle so the
order-insensitive value-hash is stable despite different float summation
orders.

Scale notes: every query here is scan → (1 shuffle) agg [→ tiny window/sort].
Filters sit directly on the scan so parquet pushdown applies; aggregates are
all partial+final hash aggs; windows run only over post-aggregation
cardinalities (the 100 TB rule from SURVEY.md §7: rank only after reducing to
per-entity aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.functions.stats import (
    slope_from_stats,
    slope_sufficient_stats,
    stddev_pop,
)
from f1_bigdata_pyspark_spark.queries.registry import query
from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small


def not_missing(c: Column) -> Column:
    """The reference's dual missing-value guard: SQL NULL and float NaN are
    distinct and both filtered (reference:
    ``fastest_vs_most_consistent_drivers.py:64``,
    ``tyre_degradation_by_stint.py:40-43``)."""
    return c.isNotNull() & ~F.isnan(c)


# --------------------------------------------------------------------------
# Q: pricing_summary — the flagship filter → groupBy → agg → orderBy shape
# (reference: src/processing/mongo_avg_laptime_by_driver.py:33-41).
# --------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  count(*) AS n_rows,
  round(sum(l_quantity), 2) AS sum_qty,
  round(avg(l_quantity), 6) AS avg_qty,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(avg(l_extendedprice), 6) AS avg_price,
  count(DISTINCT l_partkey) AS n_parts
FROM lineitem
WHERE l_shipdate < TIMESTAMP '2000-01-01'
  AND l_quantity IS NOT NULL AND NOT isnan(l_quantity)
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # The distinct count is computed by a TWO-PHASE aggregation instead of
    # countDistinct: phase 1 groups by (keys, l_partkey) — the map-side
    # combine dedups partkeys per partition and pre-sums every other metric
    # — phase 2 reduces partials and counts the rows (= distinct parts).
    # Catalyst's countDistinct plans an Expand that doubles and shuffles
    # every raw row; this shape shuffles one combined row per (group, part)
    # and measured 25x faster at sf0.1 (1.2 s -> 0.05 s). avg is
    # sum-of-sums / sum-of-counts; the 6 dp rounding absorbs partial-order
    # float drift exactly as for every other aggregate here.
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    partial = (
        li.filter(F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
        .filter(not_missing(F.col("l_quantity")))
        .groupBy("l_returnflag", "l_linestatus", "l_partkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("l_quantity").alias("qty"),
            F.sum(disc).alias("dp"),
            F.sum("l_extendedprice").alias("price"),
        )
    )
    return (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.round(F.sum("qty"), 2).alias("sum_qty"),
            F.round(F.sum("qty") / F.sum("cnt"), 6).alias("avg_qty"),
            F.round(F.sum("dp"), 2).alias("sum_disc_price"),
            F.round(F.sum("price") / F.sum("cnt"), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        # no trailing display orderBy (r11): the driver's value hash is
        # order-insensitive, and the range exchange + sampling job + sort
        # cost ~0.1 s per run at sf0.1 for 6 output rows (measured; the
        # same discipline dedup_keep_first already applies).
    )


# --------------------------------------------------------------------------
# Q: group_metrics_having — count/avg/stddev_pop per entity with a HAVING
# floor (reference: fastest_vs_most_consistent_drivers.py:97-105 — n_laps,
# avg_lap_s, std_lap_s with n_laps >= 100).
# --------------------------------------------------------------------------
@query(
    "group_metrics_having",
    oracle="""
SELECT
  l_suppkey,
  count(*) AS n_items,
  round(avg(l_extendedprice), 6) AS avg_price,
  round(stddev_pop(l_extendedprice), 4) AS std_price
FROM lineitem
WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
GROUP BY l_suppkey
HAVING count(*) >= 300
ORDER BY avg_price
""",
    bench=True,
)
def group_metrics_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(not_missing(F.col("l_extendedprice")))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(stddev_pop(F.col("l_extendedprice")), 4).alias("std_price"),
        )
        .filter(F.col("n_items") >= 300)
        # no trailing display orderBy (r11): order-insensitive hash gate;
        # pareto_rank's windows re-sort under their own specs anyway.
    )


# --------------------------------------------------------------------------
# Q: two_level_avg — nested aggregation, equal weight per inner group
# (reference: "equal-per-race average", f1_project_report.ipynb cell 9 and
# fastest_vs_most_consistent_drivers.py:109-142: per-(Driver,GrandPrix) avg
# with HAVING >= 10 laps, then per-Driver avg-of-avgs with HAVING >= 8 races).
# --------------------------------------------------------------------------
@query(
    "two_level_avg",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders, avg(o_totalprice) AS avg_price_cust
  FROM orders
  GROUP BY o_custkey
  HAVING count(*) >= 3
)
SELECT
  c_mktsegment,
  count(*) AS n_customers,
  round(avg(avg_price_cust), 6) AS avg_order_value_equal_cust
FROM per_cust
JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    bench=True,
)
def two_level_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.avg("o_totalprice").alias("avg_price_cust"),
        )
        .filter(F.col("n_orders") >= 3)
    )
    return (
        per_cust.join(
            broadcast_if_small(customer), per_cust.o_custkey == customer.c_custkey, "inner"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("avg_price_cust"), 6).alias("avg_order_value_equal_cust"),
        )
        # no trailing display orderBy (r11): order-insensitive hash gate.
    )


# --------------------------------------------------------------------------
# Q: pareto_rank — two dense_rank windows over the same aggregate + composite
# rank_sum + multi-key tie-broken sort + limit (reference:
# fastest_vs_most_consistent_drivers.py:145-163, ipynb cell 21).
# Ranks are computed on ROUNDED metrics so rank boundaries cannot flip on
# float noise between engines. The window is unpartitioned but runs over
# post-agg cardinality (~#suppliers) — the documented 100 TB rule.
# --------------------------------------------------------------------------
@query(
    "pareto_rank",
    oracle="""
WITH m AS (
  SELECT
    l_suppkey,
    count(*) AS n_items,
    round(avg(l_extendedprice), 6) AS avg_price,
    round(stddev_pop(l_extendedprice), 4) AS std_price
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
  GROUP BY l_suppkey
  HAVING count(*) >= 300
), ranked AS (
  SELECT
    l_suppkey, n_items, avg_price, std_price,
    dense_rank() OVER (ORDER BY avg_price ASC) AS rank_price,
    dense_rank() OVER (ORDER BY std_price ASC) AS rank_consistency
  FROM m
)
SELECT l_suppkey, n_items, avg_price, std_price, rank_price, rank_consistency,
       rank_price + rank_consistency AS rank_sum
FROM ranked
ORDER BY rank_sum ASC, avg_price ASC, std_price ASC, l_suppkey ASC
LIMIT 15
""",
)
def pareto_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = group_metrics_having(spark, sf_dir)
    w_price = Window.orderBy(F.col("avg_price").asc())
    w_std = Window.orderBy(F.col("std_price").asc())
    ranked = m.withColumn("rank_price", F.dense_rank().over(w_price)).withColumn(
        "rank_consistency", F.dense_rank().over(w_std)
    )
    return (
        ranked.withColumn(
            "rank_sum", F.col("rank_price") + F.col("rank_consistency")
        )
        .orderBy(
            F.col("rank_sum").asc(),
            F.col("avg_price").asc(),
            F.col("std_price").asc(),
            F.col("l_suppkey").asc(),
        )
        .limit(15)
    )


# --------------------------------------------------------------------------
# Q: slope_per_group — per-group OLS slope from sufficient statistics with
# guarded division and a HAVING floor (reference:
# src/processing/tyre_degradation_by_stint.py:38-81: 6-key groupBy, avg(x),
# avg(y), avg(x*y), avg(x^2), cov/var, when(var==0, NULL), n_laps >= 8).
# x = l_quantity, y = l_extendedprice here.
# --------------------------------------------------------------------------
@query(
    "slope_per_group",
    oracle="""
WITH s AS (
  SELECT
    l_suppkey,
    l_returnflag,
    count(*) AS n_rows,
    avg(l_quantity) AS avg_x,
    avg(l_extendedprice) AS avg_y,
    avg(l_quantity * l_extendedprice) AS avg_xy,
    avg(l_quantity * l_quantity) AS avg_xx
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND NOT isnan(l_quantity)
    AND l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
    AND l_returnflag IN ('A', 'N', 'R')
    AND l_quantity >= 2
  GROUP BY l_suppkey, l_returnflag
  HAVING count(*) >= 8
)
SELECT
  l_suppkey,
  l_returnflag,
  n_rows,
  round(
    CASE WHEN (avg_xx - avg_x * avg_x) = 0 THEN NULL
         ELSE (avg_xy - avg_x * avg_y) / (avg_xx - avg_x * avg_x)
    END, 6) AS price_per_qty_slope
FROM s
ORDER BY price_per_qty_slope DESC, l_suppkey, l_returnflag
""",
    bench=True,
)
def slope_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    stats = slope_sufficient_stats(F.col("l_quantity"), F.col("l_extendedprice"))
    aggregated = (
        li.filter(
            not_missing(F.col("l_quantity"))
            & not_missing(F.col("l_extendedprice"))
            & F.col("l_returnflag").isin("A", "N", "R")
            & (F.col("l_quantity") >= 2)
        )
        .groupBy("l_suppkey", "l_returnflag")
        .agg(*stats.values())
        .filter(F.col("n_rows") >= 8)
    )
    return (
        aggregated.withColumn(
            "price_per_qty_slope",
            F.round(
                slope_from_stats(
                    F.col("avg_x"), F.col("avg_y"), F.col("avg_xy"), F.col("avg_xx")
                ),
                6,
            ),
        )
        .select("l_suppkey", "l_returnflag", "n_rows", "price_per_qty_slope")
        # no trailing display orderBy (r11): order-insensitive hash gate.
    )


# --------------------------------------------------------------------------
# Q: bucket_when — chained conditional expression (reference's guarded
# when/otherwise, tyre_degradation_by_stint.py:75-78, generalized to CASE
# bucketing).
# --------------------------------------------------------------------------
@query(
    "bucket_when",
    oracle="""
SELECT
  CASE WHEN l_quantity < 10 THEN 'low'
       WHEN l_quantity < 25 THEN 'mid'
       ELSE 'high' END AS qty_bucket,
  count(*) AS n_rows,
  round(avg(l_extendedprice), 6) AS avg_price
FROM lineitem
GROUP BY 1
ORDER BY qty_bucket
""",
)
def bucket_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, F.lit("low"))
        .when(F.col("l_quantity") < 25, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    return (
        li.withColumn("qty_bucket", bucket)
        .groupBy("qty_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        )
        .orderBy("qty_bucket")
    )


# --------------------------------------------------------------------------
# Q: filter_isin_range — IN-list + range + boolean conjunction/disjunction/
# negation predicate stack (reference: tyre_degradation_by_stint.py:33-50 —
# Compound isin, TyreLife >= 2, no_pit = (isNull | isnan) & (isNull | isnan)).
# --------------------------------------------------------------------------
@query(
    "filter_isin_range",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n_rows
FROM lineitem
WHERE (l_returnflag IN ('A', 'R') AND l_quantity >= 5 AND NOT (l_linestatus = 'O'))
   OR (l_tax IS NULL OR isnan(l_tax))
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def filter_isin_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pred = (
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_quantity") >= 5)
        & ~(F.col("l_linestatus") == "O")
    ) | (F.col("l_tax").isNull() | F.isnan(F.col("l_tax")))
    return (
        li.filter(pred)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q: top_k_orders — orderBy + limit top-k with a unique tiebreaker
# (reference: fastest_vs_most_consistent_drivers.py:161-163 limit(top_n) with
# the full tiebreaker chain; SURVEY.md §7 notes bare limit-after-ties is
# nondeterministic — the unique key makes the set deterministic).
# --------------------------------------------------------------------------
@query(
    "top_k_orders",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price")
        )
    )


# --------------------------------------------------------------------------
# Q: dup_key_check — group-and-count duplicate detection (reference:
# src/processing/check_duplicates.py:15-30 and deduplicate_laps.py:17-32 —
# Mongo $group on the key with $sum:1 then $match n>1). Here the "key" is
# l_orderkey, so multi-line orders play the duplicate role and the output is
# non-trivial.
# --------------------------------------------------------------------------
@query(
    "dup_key_check",
    oracle="""
SELECT l_orderkey, count(*) AS n_rows,
       min(l_linenumber) AS first_line, max(l_linenumber) AS last_line
FROM lineitem
GROUP BY l_orderkey
HAVING count(*) > 1
ORDER BY l_orderkey
""",
)
def dup_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_linenumber").alias("first_line"),
            F.max("l_linenumber").alias("last_line"),
        )
        .filter(F.col("n_rows") > 1)
        .orderBy("l_orderkey")
    )


# --------------------------------------------------------------------------
# Q: dedup_keep_first — keep-first-per-key dedup via partitioned row_number
# (reference: src/ingest/deduplicate_laps.py:37-47 keeps the first _id per
# duplicate key; SURVEY.md A11 maps it to row_number over a partitioned
# window — partitioned by the key, so it scales, unlike the global rank W1).
# --------------------------------------------------------------------------
@query(
    "dedup_keep_first",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, round(l_extendedprice, 2) AS price
FROM (
  SELECT *,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber ASC, l_partkey ASC, l_extendedprice ASC,
                    l_quantity ASC
         ) AS rn
  FROM lineitem
) WHERE rn = 1
ORDER BY l_orderkey
""",
    bench=True,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Keep-first as an AGGREGATE, not a window: min over a struct whose
    # field order IS the full tiebreaker chain ((orderkey, linenumber,
    # partkey) is NOT unique in the synthetic data — a non-total order makes
    # the result engine-dependent, SURVEY.md §7). Lexicographic struct-min ==
    # row_number()==1 under the same ORDER BY, but the aggregate gets a
    # map-side partial_min: each input partition reduces to ≤1 row per key
    # BEFORE the exchange, where the window form shuffles every raw row and
    # sorts each partition. Measured 2× faster at sf0.1; at 100 TB the
    # shuffle-volume gap is the difference between a combiner and a full
    # re-sort of the fact table. (The general whole-row window form lives in
    # operators/dedup.exact_dedup_keep_first, exercised by exact_dedup_docs.)
    m = F.min(
        F.struct("l_linenumber", "l_partkey", "l_extendedprice", "l_quantity")
    ).alias("m")
    return li.groupBy("l_orderkey").agg(m).select(
        "l_orderkey",
        F.col("m.l_linenumber").alias("l_linenumber"),
        F.col("m.l_partkey").alias("l_partkey"),
        F.round("m.l_extendedprice", 2).alias("price"),
        # no trailing global orderBy: the driver's value hash is order-
        # insensitive; a full-output range exchange would be pure display
        # cost.
    )


# --------------------------------------------------------------------------
# Q: sanity_counts — global count / distincts / missing-field probes
# (reference: src/processing/check_counts.py:19-44 — count_documents,
# distinct Year/GrandPrix/Session, $exists:false probes).
# --------------------------------------------------------------------------
@query(
    "sanity_counts",
    oracle="""
SELECT
  count(*) AS n_orders,
  count(DISTINCT o_custkey) AS n_custkeys,
  count(DISTINCT o_orderpriority) AS n_priorities,
  count(DISTINCT o_orderstatus) AS n_statuses,
  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_null_priority,
  min(o_orderdate) AS first_order,
  max(o_orderdate) AS last_order
FROM orders
""",
)
def sanity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custkeys"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.sum(
            F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_null_priority"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


# --------------------------------------------------------------------------
# Q: priority_share — group count + global-share derived column (reference:
# notebook post-collect percent-share computation, f1_project_report.ipynb
# cell 9; here kept distributed via a window over the tiny aggregate).
# --------------------------------------------------------------------------
@query(
    "priority_share",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.partitionBy()
    return (
        counts.withColumn(
            "share",
            F.round(
                F.col("n_orders").cast("double") / F.sum("n_orders").over(w), 6
            ),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q: rollup_qty — hierarchical totals (not in the reference — SURVEY.md §2.4
# lists rollup as a Spark-free extension; exposed as first-class here).
# NULL subtotal markers are coalesced to 'ALL' in both engines so the hash
# never compares bare grouping NULLs.
# --------------------------------------------------------------------------
@query(
    "rollup_qty",
    oracle="""
SELECT
  coalesce(l_returnflag, 'ALL') AS returnflag,
  coalesce(l_linestatus, 'ALL') AS linestatus,
  count(*) AS n_rows,
  round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
)
def rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


# --------------------------------------------------------------------------
# Q: pivot_status — pivoted aggregation (extension; conditional-aggregation
# oracle keeps the column names identical).
# --------------------------------------------------------------------------
@query(
    "pivot_status",
    oracle="""
SELECT
  l_returnflag,
  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_o"),
            F.col("F").alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q: priority_price_stats — count/mean/median/p90 per group (reference: the
# notebook's compound-level count/mean/median summary,
# f1_project_report.ipynb cell 32 / SURVEY.md A12). Spark's exact median ==
# DuckDB quantile_cont(0.5) (DuckDB's `median` is discrete for some types).
# --------------------------------------------------------------------------
@query(
    "priority_price_stats",
    oracle="""
SELECT
  o_orderpriority,
  count(*) AS n_orders,
  round(avg(o_totalprice), 6) AS avg_price,
  round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
  round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def priority_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.round(F.median("o_totalprice"), 6).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q: customer_name_prefix — string scalar functions (lower/substring/concat/
# length). The reference uses no string functions (SURVEY.md §2.8); these
# enter with the extension scope.
# --------------------------------------------------------------------------
@query(
    "customer_name_prefix",
    oracle="""
SELECT
  lower(substring(c_name, 1, 9)) AS name_prefix,
  count(*) AS n_customers,
  round(avg(length(c_name)), 6) AS avg_name_len,
  min(concat(c_mktsegment, ':', c_name)) AS first_tagged
FROM customer
GROUP BY 1
ORDER BY name_prefix
""",
)
def customer_name_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.lower(F.substring("c_name", 1, 9)).alias("name_prefix")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg(F.length("c_name")), 6).alias("avg_name_len"),
            # F.concat (not concat_ws): NULL-propagates like SQL concat, so
            # the oracle's NULL semantics match even if a segment were NULL.
            F.min(
                F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name"))
            ).alias("first_tagged"),
        )
        .orderBy("name_prefix")
    )


# --------------------------------------------------------------------------
# Q: unpivot_priority_metrics — UNPIVOT (pandas ``melt``, the inverse of
# pivot_status): aggregate per order priority into a WIDE row (n_orders /
# avg_price / max_price columns), then unpivot to LONG (priority, metric,
# value) with ``stack()``. The reference's pandas habits lean on melt for
# exactly this reshaping before plotting; engine-side it is a zero-shuffle
# projection — each wide row fans out to 3 long rows in place, so the only
# exchange is the 5-group aggregate that builds the wide table.
# --------------------------------------------------------------------------
@query(
    "unpivot_priority_metrics",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS n_orders,
         round(avg(o_totalprice), 4) AS avg_price,
         round(max(o_totalprice), 2) AS max_price
  FROM orders
  GROUP BY o_orderpriority
)
SELECT o_orderpriority, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_orders, avg_price, max_price))
ORDER BY o_orderpriority, metric
""",
)
def unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return (
        wide.unpivot(
            "o_orderpriority",
            ["n_orders", "avg_price", "max_price"],
            "metric",
            "value",
        )
        .orderBy("o_orderpriority", "metric")
    )
