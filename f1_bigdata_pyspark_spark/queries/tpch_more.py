"""Additional TPC-H-shaped queries widening the SQL surface (SURVEY.md §7
step 3 — capability extension beyond the reference's zero-join repertoire).

Each query is a classic TPC-H access pattern re-expressed on the driver's
synthetic star schema, chosen to exercise a distinct physical plan shape:

- forecast_revenue      (Q6)  — pure scan-filter-agg; predicate pushdown.
- promo_revenue_share   (Q14) — conditional aggregate over a broadcast join.
- small_quantity_revenue(Q17) — aggregate subquery joined back to the fact.
- large_volume_customers(Q18) — having-filtered agg driving a semi-join-ish
                                 lookup into orders/customer.
- nation_market_share   (Q8)  — multi-dim star join + conditional share.
- order_value_deciles         — ntile window with a unique sort key.
- intersect_except_custkeys   — INTERSECT / EXCEPT set semantics.
- distinct_users_by_type      — exact distinct aggregate (shuffle-heavy path).
- price_quantiles_by_brand    — exact percentiles (continuous interpolation).

Scale notes (100 TB): every dimension join is broadcast; the Q17 per-part
average is a partial-aggregated shuffle on the join key itself so the re-join
is co-partitioned; Q18's HAVING reduces before any wide join; the ntile
window partitions by nothing but runs *after* reduction to one row per order
(15k rows/sf — at full scale you'd ntile within a partition key or sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.queries.registry import query
from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small


# --------------------------------------------------------------------------
# Q: forecast_revenue — TPC-H Q6 shape: scan-filter-aggregate, no join.
# The whole query should collapse to one parquet scan with pushed filters
# plus a single-row partial+final agg.
# --------------------------------------------------------------------------
@query(
    "forecast_revenue",
    oracle="""
SELECT
  round(sum(l_extendedprice * l_discount), 2) AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""",
    bench=True,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q: promo_revenue_share — TPC-H Q14 shape: conditional aggregate over a
# broadcast part join; one shuffle total (the final single-row agg).
# --------------------------------------------------------------------------
@query(
    "promo_revenue_share",
    oracle="""
SELECT
  round(
    100.0 * sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
    / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct,
  count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-09-01'
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.join(broadcast_if_small(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            / F.sum(rev),
            6,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# Q: small_quantity_revenue — TPC-H Q17 shape: per-part average quantity
# (aggregate subquery) joined back to the fact table, then filter rows under
# 20% of their part's average. The agg and the re-join share the l_partkey
# partitioning, so AQE can plan the second join shuffle-free.
# --------------------------------------------------------------------------
@query(
    "small_quantity_revenue",
    oracle="""
SELECT
  round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
  count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey, 0.2 * avg(l_quantity) AS qty_cut
  FROM lineitem GROUP BY l_partkey
) ON a_partkey = l_partkey
WHERE p_brand = 'Brand#13' AND l_quantity < qty_cut
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    cuts = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(broadcast_if_small(part), li.l_partkey == part.p_partkey)
        .join(cuts, F.col("a_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q: large_volume_customers — TPC-H Q18 shape: HAVING-filtered aggregate on
# the fact key, then joined to orders + broadcast customer. The HAVING
# reduces 4 rows/order to ~1/5 of orders *before* any join.
# --------------------------------------------------------------------------
@query(
    "large_volume_customers",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, round(sum_qty, 2) AS sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
""",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(broadcast_if_small(customer), customer.c_custkey == orders.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )


# --------------------------------------------------------------------------
# Q: nation_market_share — TPC-H Q8 shape: star join through the *supplier*
# side (lineitem⋈supplier⋈nation⋈region + orders for the year), conditional
# share of one nation within a region per year.
# --------------------------------------------------------------------------
@query(
    "nation_market_share",
    oracle="""
SELECT
  extract(year FROM o_orderdate) AS o_year,
  round(sum(CASE WHEN n_name = 'NATION_3'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
GROUP BY o_year
ORDER BY o_year
""",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(broadcast_if_small(supplier), supplier.s_suppkey == li.l_suppkey)
        .join(broadcast_if_small(nation), nation.n_nationkey == supplier.s_nationkey)
        .join(broadcast_if_small(region), region.r_regionkey == nation.n_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(F.lit(0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q: order_value_deciles — ntile(10) window. Sort key is (o_totalprice,
# o_orderkey) — unique, so tile assignment is engine-independent.
# --------------------------------------------------------------------------
@query(
    "order_value_deciles",
    oracle="""
SELECT decile,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       round(avg(o_totalprice), 4) AS avg_price
FROM (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY decile
ORDER BY decile
""",
)
def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Q: intersect_except_custkeys — INTERSECT / EXCEPT (distinct set semantics):
# customers that are both high-value and recent, and high-value-only.
# --------------------------------------------------------------------------
@query(
    "intersect_except_custkeys",
    oracle="""
WITH hv AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000),
     rc AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '2000-01-01')
SELECT
  (SELECT count(*) FROM (SELECT * FROM hv INTERSECT SELECT * FROM rc)) AS n_both,
  (SELECT count(*) FROM (SELECT * FROM hv EXCEPT SELECT * FROM rc)) AS n_hv_only
""",
)
def intersect_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    hv = orders.filter(F.col("o_totalprice") > 200000).select("o_custkey").distinct()
    rc = (
        orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    both = hv.intersect(rc).agg(F.count(F.lit(1)).alias("n_both"))
    hv_only = hv.subtract(rc).agg(F.count(F.lit(1)).alias("n_hv_only"))
    return both.crossJoin(hv_only)


# --------------------------------------------------------------------------
# Q: distinct_users_by_type — exact COUNT(DISTINCT) per group: the expand +
# two-phase-agg path (Spark rewrites distinct aggs into a double shuffle).
# --------------------------------------------------------------------------
@query(
    "distinct_users_by_type",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: price_quantiles_by_brand — exact continuous percentiles (Spark
# `percentile` == DuckDB `quantile_cont`, both linear interpolation).
# --------------------------------------------------------------------------
@query(
    "price_quantiles_by_brand",
    oracle="""
SELECT p_brand,
       count(*) AS n_parts,
       round(quantile_cont(p_retailprice, 0.25), 4) AS p25,
       round(quantile_cont(p_retailprice, 0.50), 4) AS p50,
       round(quantile_cont(p_retailprice, 0.75), 4) AS p75
FROM part
GROUP BY p_brand
ORDER BY p_brand
""",
)
def price_quantiles_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.percentile("p_retailprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("p_retailprice", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("p_retailprice", F.lit(0.75)), 4).alias("p75"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Q: grouping_sets_revenue — explicit GROUPING SETS (not a rollup/cube
# prefix chain) + grouping_id to disambiguate NULL-as-total from NULL-as-key.
# --------------------------------------------------------------------------
@query(
    "grouping_sets_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
ORDER BY gid, l_returnflag, l_linestatus
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Spark's grouping_id bit order is reversed vs the column list; compute
    # the oracle's gid explicitly from per-column grouping() bits.
    gid = (F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")).alias(
        "gid"
    )
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            gid,
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q: orders_trailing_90d — RANGE frame window: for each order, that
# customer's order count and spend over the trailing 90 days (value-based
# frame on days-since-epoch, not row-based). Partitioned by customer — the
# frame state never crosses an executor (plan test pins the single
# o_custkey exchange).
#
# 100× path: this emits one row per ORDER, so the window state is O(orders
# per customer). If per-order output is not required at full scale, first
# reduce to daily partials per customer (groupBy(custkey, day) → count/sum
# — map-side combined), then run the same RANGE frame over the partials:
# identical trailing sums at day granularity with window state bounded by
# 91 days per customer instead of raw order count.
# --------------------------------------------------------------------------
@query(
    "orders_trailing_90d",
    oracle="""
SELECT o_orderkey, o_custkey,
       count(*) OVER w AS n_90d,
       round(sum(o_totalprice) OVER w, 2) AS spend_90d
FROM (SELECT o_orderkey, o_custkey, o_totalprice,
             datediff('day', DATE '1970-01-01', o_orderdate) AS od
      FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY od
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
""",
)
def orders_trailing_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "od"
        ),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("od")
        .rangeBetween(-90, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.count(F.lit(1)).over(w).alias("n_90d"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("spend_90d"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Q: disjunctive_brand_revenue — TPC-H Q19 shape: OR of conjunctive
# brand/size/quantity clauses across the join. Catalyst splits the common
# part (the join key + p_size/l_quantity ranges) for pushdown and evaluates
# the residual OR post-join — the pattern where naive engines lose pushdown
# entirely.
# --------------------------------------------------------------------------
@query(
    "disjunctive_brand_revenue",
    oracle="""
SELECT count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 35)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
""",
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(broadcast_if_small(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Q: priority_order_exists — TPC-H Q4 shape: correlated EXISTS against the
# fact table. Expressed as a LEFT SEMI join in Spark — Catalyst's
# decorrelation target — so the lineitem side is filtered + deduped by the
# join itself, never materialized per-order.
# --------------------------------------------------------------------------
@query(
    "priority_order_exists",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def priority_order_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    big_items = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 45
    )
    return (
        orders.join(
            big_items,
            orders["o_orderkey"] == big_items["l_orderkey"],
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q: customer_order_distribution — TPC-H Q13 shape: LEFT OUTER join keeping
# zero-order customers, then the distribution of order counts. Two keyed
# aggregations; the left join is the only place an inner join would be
# silently wrong (it would drop the c_count=0 bucket).
# --------------------------------------------------------------------------
@query(
    "customer_order_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    # pre-aggregate the fact side BEFORE the join: the per-customer count is
    # map-side combined, so the join exchange moves one row per customer
    # instead of every raw order (the oracle's LEFT JOIN + count is the same
    # math — count() over no match == COALESCE of a missing pre-agg row == 0)
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    per_cust = cust.join(
        oc, cust["c_custkey"] == oc["o_custkey"], "left"
    ).select(F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q: dormant_rich_customers — TPC-H Q22 shape: scalar subquery (global avg
# balance) + NOT EXISTS anti join, grouped by a name-digit cohort. The
# scalar avg becomes a broadcast 1-row cross join; the NOT EXISTS a LEFT
# ANTI join against urgent orders.
# --------------------------------------------------------------------------
@query(
    "dormant_rich_customers",
    oracle="""
WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0),
eligible AS (
  SELECT c_custkey, substring(c_name, 17, 2) AS cohort, c_acctbal
  FROM customer, avg_bal WHERE c_acctbal > ab
)
SELECT cohort, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
FROM eligible e
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY cohort ORDER BY cohort
""",
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    eligible = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .select(
            "c_custkey",
            F.substring("c_name", 17, 2).alias("cohort"),
            "c_acctbal",
        )
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        eligible.join(
            urgent,
            eligible["c_custkey"] == urgent["o_custkey"],
            "left_anti",
        )
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("cohort")
    )


# --------------------------------------------------------------------------
# Q: sole_big_supplier — TPC-H Q21 shape: double correlation (EXISTS a big
# item by this supplier AND NOT EXISTS a big item by any OTHER supplier in
# the same order). Decorrelates to a self anti-join on the order key with a
# supplier-inequality residual — the fact table never re-scans per row.
# --------------------------------------------------------------------------
@query(
    "sole_big_supplier",
    oracle="""
WITH big AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 40)
SELECT s.s_name, count(DISTINCT b1.l_orderkey) AS n_orders
FROM big b1 JOIN supplier s ON s.s_suppkey = b1.l_suppkey
WHERE NOT EXISTS (SELECT 1 FROM big b2 WHERE b2.l_orderkey = b1.l_orderkey
                  AND b2.l_suppkey <> b1.l_suppkey)
GROUP BY s.s_name ORDER BY s.s_name
""",
)
def sole_big_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    big = li.filter(F.col("l_quantity") >= 40).select("l_orderkey", "l_suppkey")
    b1 = big.alias("b1")
    b2 = big.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    sole = b1.join(
        b2,
        (F.col("b1.l_orderkey") == F.col("o2"))
        & (F.col("b1.l_suppkey") != F.col("s2")),
        "left_anti",
    )
    return (
        sole.join(
            broadcast_if_small(supplier),
            F.col("b1.l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.countDistinct("b1.l_orderkey").alias("n_orders"))
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q: top_revenue_supplier — TPC-H Q15 shape: aggregate "view" + scalar max
# subquery selecting the argmax row(s). The scalar max is a broadcast 1-row
# join; revenue is rounded BEFORE the equality so ties resolve identically
# in any double engine.
# --------------------------------------------------------------------------
@query(
    "top_revenue_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
""",
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))),
                2,
            ).alias("total_rev")
        )
    )
    top = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(broadcast_if_small(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q: min_cost_supplier_per_part — TPC-H Q2 shape: correlated per-part
# minimum over the part↔supplier relation (derived from lineitem; the
# schema has no partsupp table), decorrelated to a keyed min + equi-join.
# The min re-join shares the l_partkey partitioning with the per-(part,
# supplier) aggregate, so AQE plans it without a second fact exchange.
# Unit costs round to 6 dp BEFORE the min equality — ties return all
# minimal suppliers identically in both engines.
# --------------------------------------------------------------------------
@query(
    "min_cost_supplier_per_part",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         round(avg(l_extendedprice / l_quantity), 6) AS unit_cost
  FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey AS bk, min(unit_cost) AS mc FROM ps GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_brand, s.s_name, ps.unit_cost
FROM ps
JOIN best ON bk = ps.l_partkey AND ps.unit_cost = best.mc
JOIN part p ON p.p_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE p.p_size <= 10
ORDER BY p.p_partkey, s.s_name
""",
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supplier = load_table(spark, sf_dir, "supplier")
    ps = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 6
            ).alias("unit_cost")
        )
    )
    best = ps.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("unit_cost").alias("mc")
    )
    return (
        ps.join(
            best,
            (F.col("bk") == F.col("l_partkey"))
            & (F.col("unit_cost") == F.col("mc")),
        )
        .join(broadcast_if_small(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(broadcast_if_small(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_brand", "s_name", "unit_cost")
        .orderBy("p_partkey", "s_name")
    )


# --------------------------------------------------------------------------
# Q: local_supplier_revenue — TPC-H Q5 shape: the star join with the extra
# NON-join-key equality between two dimension attributes (customer nation ==
# supplier nation, "local supplier volume"). The cross-dimension predicate
# evaluates as a post-join residual over broadcast dims — the fact table
# still shuffles only for lineitem⋈orders.
# --------------------------------------------------------------------------
@query(
    "local_supplier_revenue",
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name ORDER BY revenue DESC, n_name
""",
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast_if_small(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(broadcast_if_small(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast_if_small(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --------------------------------------------------------------------------
# Q: bilateral_trade_volume — TPC-H Q7 shape: the SAME dimension joined
# TWICE under different roles (supplier nation vs customer nation) with a
# cross-role inequality — yearly trade volume between two named nations in
# both directions.
# --------------------------------------------------------------------------
@query(
    "bilateral_trade_volume",
    oracle="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(o_orderdate) AS yr,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name IN ('NATION_1', 'NATION_2')
  AND nc.n_name IN ('NATION_1', 'NATION_2')
  AND ns.n_name <> nc.n_name
GROUP BY supp_nation, cust_nation, yr
ORDER BY supp_nation, cust_nation, yr
""",
)
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast_if_small(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(broadcast_if_small(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(broadcast_if_small(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(broadcast_if_small(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("o_orderdate").alias("yr")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))),
                2,
            ).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "yr")
    )


# --------------------------------------------------------------------------
# Q: product_profit_by_nation — TPC-H Q9 shape: profit per (nation, year)
# for parts matching a name pattern. The synthetic schema has no partsupp
# table, so ps_supplycost is stood in by 0.6 * p_retailprice (the shape —
# a big fact⋈fact join plus three broadcast dims feeding a two-key agg —
# is what Q9 exercises, not the cost constant).
# Scale: part/supplier/nation broadcast; the only shuffle joins are
# lineitem⋈orders (both scale with the data) and the final 2-key agg, which
# partial-aggregates map-side. The p_name LIKE filter prunes the broadcast
# build side before it ships.
# --------------------------------------------------------------------------
@query(
    "product_profit_by_nation",
    oracle="""
SELECT n_name AS nation_name,
       year(o_orderdate) AS o_year,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity) * 100) AS BIGINT))
            AS BIGINT) / 100.0 AS profit,
       count(*) AS n_items
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY nation_name, o_year
ORDER BY nation_name, o_year DESC
""",
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # exact-cents discipline: rounding each row to integer cents and summing
    # as int64 makes the aggregate independent of summation order — float
    # sums differ in the last cent between engines at this cardinality
    profit_cents = F.round(
        (
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    ).cast("long")
    return (
        li.join(broadcast_if_small(part), part.p_partkey == li.l_partkey)
        .join(broadcast_if_small(supplier), supplier.s_suppkey == li.l_suppkey)
        .join(broadcast_if_small(nation), nation.n_nationkey == supplier.s_nationkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            (F.sum(profit_cents) / 100.0).alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("nation_name"), F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q: returnflag_priority_classes — TPC-H Q12 shape: join the fact to orders
# and split a count by order-priority class with conditional aggregation.
# l_returnflag stands in for l_shipmode (the synthetic lineitem has no
# shipmode/commitdate columns); the physical shape — shuffle join on
# orderkey, map-side partial agg of two CASE counts — is Q12's.
# --------------------------------------------------------------------------
@query(
    "returnflag_priority_classes",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_returnflag IN ('A', 'R')
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def returnflag_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_returnflag").isin("A", "R")
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q: supplier_count_by_part_attrs — TPC-H Q16 shape: how many distinct
# suppliers ship each (brand, type, size) bucket, excluding one brand, a
# type prefix, and "complaint" suppliers (stand-in: negative account
# balance, excluded with a broadcast anti-join — TPC-H uses NOT IN over a
# LIKE subquery).
# Scale: the distinct pair set (l_partkey, l_suppkey) is reduced BEFORE the
# part join (dropDuplicates partial-aggregates map-side); part and the
# exclusion list broadcast; the count-distinct agg runs on the already
# deduplicated pairs.
# --------------------------------------------------------------------------
@query(
    "supplier_count_by_part_attrs",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#2'
  AND p_type <> 'ECONOMY'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .dropDuplicates()
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50)
    )
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(
            broadcast_if_small(complaints),
            pairs.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .join(broadcast_if_small(part), part.p_partkey == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# --------------------------------------------------------------------------
# Q: dominant_part_suppliers — TPC-H Q20 shape: suppliers who shipped more
# than half of a filtered part's 1997 volume (partsupp's availqty>0.5*sum
# becomes supplier-share>0.5 of the part's shipped quantity — same nested
# aggregate-vs-aggregate comparison), surfaced with name/balance via a
# semi-join into supplier.
# Scale: both aggregates shuffle on l_partkey(+l_suppkey) with map-side
# partials; the share comparison joins two already-reduced aggregates on
# the same key (co-partitioned); the final supplier lookup is a broadcast
# semi-join of a tiny qualifying set.
# --------------------------------------------------------------------------
@query(
    "dominant_part_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
  GROUP BY l_partkey, l_suppkey
),
totals AS (
  SELECT l_partkey, sum(supp_qty) AS part_qty
  FROM shipped GROUP BY l_partkey
)
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM shipped JOIN totals USING (l_partkey)
  WHERE supp_qty > 0.5 * part_qty
)
ORDER BY s_name
""",
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    bolt_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(broadcast_if_small(bolt_parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    totals = shipped.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    dominant = (
        shipped.join(totals, "l_partkey")
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(broadcast_if_small(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q: important_part_value — TPC-H Q11 shape (the one TPC-H access pattern
# previously missing): per-part shipped value for ONE nation's suppliers,
# keeping parts above a FRACTION OF THE GLOBAL TOTAL — a scalar-subquery
# HAVING. Physically: one lineitem⋈supplier(⋈nation) narrow join, one
# partial+final agg per part, then the global total is a re-aggregate of
# that SAME per-part table (no second fact pass) broadcast back as a 1-row
# literal join. Scale: at 100 TB the threshold side is always 1 row —
# Catalyst plans a BroadcastNestedLoopJoin over one row, which is free;
# the fact is scanned once. Boundary safety: the closest part value sits
# 9.4e-5 (relative) from the threshold at sf0.01, ~10 orders of magnitude
# above cross-engine double-sum reassociation noise, so the HAVING cannot
# flap between Spark and the oracle.
# --------------------------------------------------------------------------
@query(
    "important_part_value",
    oracle="""
WITH pv AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_9'
  GROUP BY l_partkey
)
SELECT l_partkey, round(val, 2) AS part_value
FROM pv
WHERE val > (SELECT sum(val) FROM pv) * 0.0005
ORDER BY part_value DESC, l_partkey
""",
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_9")
        .select("n_nationkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            broadcast_if_small(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    pv = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            broadcast_if_small(supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "val"
            )
        )
    )
    threshold = pv.agg((F.sum("val") * F.lit(0.0005)).alias("thr"))
    return (
        pv.join(F.broadcast(threshold))  # 1-row scalar, always broadcast
        .filter(F.col("val") > F.col("thr"))
        .select("l_partkey", F.round("val", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# --------------------------------------------------------------------------
# Q: copurchase_part_pairs — market-basket co-occurrence mining: the top
# part pairs bought together in one order. The naive form is a quadratic
# self-join; the scale discipline is that the join key is the ORDER — the
# pair explosion is bounded per key by the basket size (≤ ~13 items here,
# ~7 lines in TPC-H), so the join output is Σ C(basket,2) ≈ linear in
# orders, never corpus². Dedup to distinct (order, part) BEFORE pairing
# (multi-line orders repeat parts), pair with p1 < p2, map-side-combined
# count, top-k under a total order, broadcast part names last (names join
# the 15-row result, not the pair table).
# --------------------------------------------------------------------------
@query(
    "copurchase_part_pairs",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
  FROM op a
  JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT p1, p2, pa.p_name AS name1, pb.p_name AS name2,
       CAST(n_orders AS BIGINT) AS n_orders
FROM pairs
JOIN part pa ON pa.p_partkey = p1
JOIN part pb ON pb.p_partkey = p2
ORDER BY n_orders DESC, p1, p2
LIMIT 15
""",
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "p1", "p2")
        .limit(15)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    pa = broadcast_if_small(
        part.select(F.col("p_partkey").alias("p1"), F.col("p_name").alias("name1"))
    )
    pb = broadcast_if_small(
        part.select(F.col("p_partkey").alias("p2"), F.col("p_name").alias("name2"))
    )
    return (
        pairs.join(pa, "p1")
        .join(pb, "p2")
        .select("p1", "p2", "name1", "name2", "n_orders")
        .orderBy(F.col("n_orders").desc(), "p1", "p2")
    )


# --------------------------------------------------------------------------
# Q: region_nation_share — hierarchical percent-of-parent (ratio-to-report):
# each nation's revenue as a share of ITS REGION, and each region's share
# of the total — the drill-down readout every BI layer ships. Physically:
# one star-join aggregate to the (region, nation) rollup (the only
# corpus-sized work), then a region-keyed window over the 25-row rollup
# for the parent share and a broadcast 1-row total for the grand share —
# deliberately NOT a global window (same answer, no single-partition
# sort).
# --------------------------------------------------------------------------
@query(
    "region_nation_share",
    oracle="""
WITH nr AS (
  SELECT r_name, n_name, sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       round(rev, 2) AS revenue,
       round(rev / sum(rev) OVER (PARTITION BY r_name), 6)
         AS share_of_region,
       round(sum(rev) OVER (PARTITION BY r_name) / sum(rev) OVER (), 6)
         AS region_share_of_total
FROM nr
ORDER BY r_name, n_name
""",
)
def region_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nr = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(customer), F.col("o_custkey") == customer.c_custkey)
        .join(broadcast_if_small(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(broadcast_if_small(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("rev")
        )
    )
    w_region = Window.partitionBy("r_name")
    total = nr.agg(F.sum("rev").alias("total_rev"))
    return (
        nr.withColumn("region_rev", F.sum("rev").over(w_region))
        .join(F.broadcast(total))
        .select(
            "r_name",
            "n_name",
            F.round("rev", 2).alias("revenue"),
            F.round(F.col("rev") / F.col("region_rev"), 6).alias(
                "share_of_region"
            ),
            F.round(F.col("region_rev") / F.col("total_rev"), 6).alias(
                "region_share_of_total"
            ),
        )
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# Q: order_fulfillment_latency — operational lifecycle analytics: days
# from order date to the LAST shipment of the order, exact p50/p90/p99
# per priority. The order⋈lineitem join and the per-order max both key on
# l_orderkey, so AQE plans the rollup on the join's own partitioning (no
# second exchange); the percentile aggregate then runs over one row per
# order. At 100 TB exact tail percentiles give way to percentile_approx
# with a pinned error budget (approx_quantile_accuracy shows that
# contract).
# --------------------------------------------------------------------------
@query(
    "order_fulfillment_latency",
    oracle="""
WITH lat AS (
  SELECT o_orderkey, o_orderpriority,
         date_diff('day', o_orderdate, max(l_shipdate)) AS days
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_orderkey, o_orderpriority, o_orderdate
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(quantile_cont(days, 0.5), 6) AS p50_days,
       round(quantile_cont(days, 0.9), 6) AS p90_days,
       round(quantile_cont(days, 0.99), 6) AS p99_days
FROM lat
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("last_ship").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("days"),
        )
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.percentile("days", F.lit(0.5)), 6).alias("p50_days"),
            F.round(F.percentile("days", F.lit(0.9)), 6).alias("p90_days"),
            F.round(F.percentile("days", F.lit(0.99)), 6).alias("p99_days"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q: order_backlog_daily_peak — supply-chain backlog over time by
# sweep-line: an order is "open" from o_orderdate until its LAST lineitem
# ships; emit (+1 at open, −1 at close) deltas, running-sum over the date
# grid, report each month's peak backlog. The sessions sweep-line
# (concurrent_sessions_peak) on a different table with a DERIVED interval
# — and the close date needs a co-partitioned order⋈lineitem max-rollup
# first. Exact integer deltas and counts; same-day opens and closes NET
# into one per-day delta before the sweep, so intra-day ordering can
# never matter (end-of-day backlog semantics). Scale: one order-keyed
# rollup + a date-grid-sized sweep (the window partitions by nothing but
# runs on the ≤#days delta table — allowlisted day-grid global).
# --------------------------------------------------------------------------
@query(
    "order_backlog_daily_peak",
    oracle="""
WITH closes AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS close_d
  FROM lineitem GROUP BY l_orderkey
),
iv AS (
  SELECT CAST(o.o_orderdate AS DATE) AS open_d, c.close_d
  FROM orders o JOIN closes c ON o.o_orderkey = c.l_orderkey
),
deltas AS (
  SELECT d, CAST(sum(delta) AS BIGINT) AS delta FROM (
    SELECT open_d AS d, 1 AS delta FROM iv
    UNION ALL SELECT close_d, -1 FROM iv
  ) GROUP BY d
),
run AS (
  SELECT d, CAST(sum(delta) OVER (ORDER BY d
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
  FROM deltas
)
SELECT CAST(date_trunc('month', d) AS DATE) AS month,
       CAST(max(backlog) AS BIGINT) AS peak_backlog
FROM run
GROUP BY 1 ORDER BY 1
""",
)
def order_backlog_daily_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    closes = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("close_d")
    )
    iv = orders.join(
        closes, orders.o_orderkey == closes.l_orderkey
    ).select(F.col("o_orderdate").cast("date").alias("open_d"), "close_d")
    deltas = (
        iv.select(
            F.explode(
                F.array(
                    F.struct(F.col("open_d").alias("d"), F.lit(1).alias("delta")),
                    F.struct(
                        F.col("close_d").alias("d"), F.lit(-1).alias("delta")
                    ),
                )
            ).alias("e")
        )
        .select("e.d", "e.delta")
        .groupBy("d")
        .agg(F.sum("delta").cast("long").alias("delta"))
    )
    # bounded day-grid global window (allowlisted): ≤ #distinct dates
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = deltas.select("d", F.sum("delta").over(w).cast("long").alias("backlog"))
    return (
        run.groupBy(F.date_trunc("month", "d").cast("date").alias("month"))
        .agg(F.max("backlog").cast("long").alias("peak_backlog"))
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# Q: customer_cohort_revenue_triangle — cohort-LTV triangle: customers
# cohorted by FIRST-order year, revenue rolled up by (cohort_year, age =
# order_year − cohort_year). The upper-triangular matrix every retention
# finance model starts from — "how much does the 1993 cohort still spend
# 4 years in". First-order year is a per-customer min aggregate (one
# customer-keyed exchange); the cohort join is co-partitioned on custkey;
# revenue is exact integer cents with a fixed-order dollar readout.
# Scale: two customer-keyed rollups, no windows, cells ≤ years².
# --------------------------------------------------------------------------
@query(
    "customer_cohort_revenue_triangle",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, CAST(min(year(o_orderdate)) AS BIGINT) AS cohort_year
  FROM orders GROUP BY o_custkey
),
cells AS (
  SELECT f.cohort_year,
         CAST(year(o.o_orderdate) AS BIGINT) - f.cohort_year AS age,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
)
SELECT cohort_year, age, n_orders,
       round(cents / 100.0, 2) AS revenue
FROM cells
ORDER BY cohort_year, age
""",
)
def customer_cohort_revenue_triangle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).cast("long").alias("cohort_year")
    )
    return (
        orders.join(firsts, "o_custkey")
        .groupBy(
            "cohort_year",
            (F.year("o_orderdate").cast("long") - F.col("cohort_year")).alias(
                "age"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0,
                2,
            ).alias("revenue"),
        )
        .orderBy("cohort_year", "age")
    )


# --------------------------------------------------------------------------
# Q: fulfillment_latency_percentiles — logistics SLA readout: exact
# p50/p90/p99 of order-to-ship days per order priority, plus the share
# shipping within 30 days. Latency days are small exact integers, so the
# exact percentile is the histogram form: per (priority, days) counts,
# cumulative within priority, smallest value with 100·cum ≥ q·total —
# integer comparisons only (the weighted-median rule; no interpolation
# ambiguity between engines). Complements order_fulfillment_latency's
# mean with the tail the SLA actually cares about. Scale: one
# co-partitioned order⋈lineitem join + a (priority, days) rollup; windows
# partition by priority over the bounded day domain.
# --------------------------------------------------------------------------
@query(
    "fulfillment_latency_percentiles",
    oracle="""
WITH t AS (
  SELECT o.o_orderpriority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS days
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
h AS (
  SELECT o_orderpriority, days, CAST(count(*) AS BIGINT) AS n
  FROM t GROUP BY o_orderpriority, days
),
c AS (
  SELECT o_orderpriority, days, n,
         CAST(sum(n) OVER (PARTITION BY o_orderpriority ORDER BY days
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS total
  FROM h
)
SELECT o_orderpriority,
       max(total) AS n_lineitems,
       CAST(min(CASE WHEN 100 * cum >= 50 * total THEN days END) AS BIGINT)
         AS p50_days,
       CAST(min(CASE WHEN 100 * cum >= 90 * total THEN days END) AS BIGINT)
         AS p90_days,
       CAST(min(CASE WHEN 100 * cum >= 99 * total THEN days END) AS BIGINT)
         AS p99_days,
       round(sum(CASE WHEN days <= 30 THEN n ELSE 0 END) * 1.0 / max(total),
             6) AS within_30d
FROM c
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def fulfillment_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    t = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("days"),
    )
    h = t.groupBy("o_orderpriority", "days").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("o_orderpriority")
    c = h.select(
        "o_orderpriority",
        "days",
        "n",
        F.sum("n").over(wcum).cast("long").alias("cum"),
        F.sum("n").over(wall).cast("long").alias("total"),
    )

    def pct(q: int):
        return F.min(
            F.when(100 * F.col("cum") >= q * F.col("total"), F.col("days"))
        ).cast("long")

    return (
        c.groupBy("o_orderpriority")
        .agg(
            F.max("total").alias("n_lineitems"),
            pct(50).alias("p50_days"),
            pct(90).alias("p90_days"),
            pct(99).alias("p99_days"),
            F.round(
                F.sum(
                    F.when(F.col("days") <= 30, F.col("n")).otherwise(0)
                )
                * 1.0
                / F.max("total"),
                6,
            ).alias("within_30d"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q: nation_revenue_hhi — market-concentration readout: per region, the
# Herfindahl–Hirschman index of revenue across its nations (Σ share²,
# 1/n = perfectly even, 1 = monopolized) plus the top nation's share.
# The concentration twin of the Gini face (Gini ranks inequality across
# customers; HHI measures market structure across a bounded dimension).
# Shares are integer ppm (floor), HHI = Σ share_ppm² / 1e12 — exact
# integer arithmetic until the final scale (ppm² ≤ 1e12 × ≤25 nations —
# int64 forever). Scale: one fact rollup to (region, nation) cells via
# policied dimension joins; everything after is dimension-sized.
# --------------------------------------------------------------------------
@query(
    "nation_revenue_hhi",
    oracle="""
WITH cells AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
),
tot AS (
  SELECT region, CAST(sum(cents) AS BIGINT) AS total FROM cells
  GROUP BY region
),
shares AS (
  SELECT c.region, c.nation,
         CAST(c.cents * 1000000 // t.total AS BIGINT) AS share_ppm
  FROM cells c JOIN tot t ON c.region = t.region
)
SELECT region,
       CAST(count(*) AS BIGINT) AS n_nations,
       round(sum(share_ppm * share_ppm) / 1e12, 6) AS hhi,
       round(max(share_ppm) / 1e6, 6) AS top_share
FROM shares
GROUP BY region
ORDER BY region
""",
)
def nation_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.join_policy import (
        broadcast_if_small,
    )

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    cells = (
        li.join(broadcast_if_small(sup), li.l_suppkey == sup.s_suppkey)
        .join(broadcast_if_small(nat), sup.s_nationkey == nat.n_nationkey)
        .join(broadcast_if_small(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    tot = cells.groupBy("region").agg(
        F.sum("cents").cast("long").alias("total")
    )
    shares = cells.join(broadcast_if_small(tot), "region").select(
        "region",
        F.floor(F.col("cents") * 1000000 / F.col("total"))
        .cast("long")
        .alias("share_ppm"),
    )
    return (
        shares.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.round(
                F.sum(F.col("share_ppm") * F.col("share_ppm")) / 1e12, 6
            ).alias("hhi"),
            F.round(F.max("share_ppm") / 1e6, 6).alias("top_share"),
        )
        .orderBy("region")
    )


# --------------------------------------------------------------------------
# Q: part_supply_redundancy — supply-chain resilience audit: distribution
# of suppliers-per-part (how much of the catalog is single-sourced?) and
# the single-source share per brand — the procurement risk report. Exact
# integer counts end to end: supplier multiplicity from one
# part-keyed distinct rollup, histogram + per-brand shares (ppm floor)
# from dimension-sized joins. Scale: one (part, supplier) distinct
# exchange; everything after is part/brand-sized.
# --------------------------------------------------------------------------
@query(
    "part_supply_redundancy",
    oracle="""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
mult AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers
  FROM ps GROUP BY l_partkey
),
branded AS (
  SELECT p.p_brand, m.n_suppliers
  FROM mult m JOIN part p ON m.l_partkey = p.p_partkey
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(count_if(n_suppliers = 1) AS BIGINT) AS n_single_source,
       CAST(count_if(n_suppliers = 1) * 1000000 // count(*) AS BIGINT)
         AS single_source_ppm,
       CAST(max(n_suppliers) AS BIGINT) AS max_suppliers
FROM branded
GROUP BY p_brand
ORDER BY p_brand
""",
)
def part_supply_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.join_policy import (
        broadcast_if_small,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    mult = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_suppliers"))
    )
    branded = mult.join(
        broadcast_if_small(part.select("p_partkey", "p_brand")),
        mult.l_partkey == F.col("p_partkey"),
    )
    single = F.count_if(F.col("n_suppliers") == 1).cast("long")
    return (
        branded.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            single.alias("n_single_source"),
            F.floor(single * 1000000 / F.count(F.lit(1)))
            .cast("long")
            .alias("single_source_ppm"),
            F.max("n_suppliers").cast("long").alias("max_suppliers"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Q: item_item_cosine — cosine-normalized co-occurrence similarity (the
# classic item-item collaborative-filtering score): sim(i,j) =
# n_ij / sqrt(n_i · n_j) over distinct order baskets, top-15 pairs. The
# normalization separates "popular with everything" from "genuinely bought
# together" — raw copurchase counts (copurchase_part_pairs) rank ubiquity;
# cosine ranks affinity. Scale: the pair space stays basket-bounded
# (Σ C(basket,2), same discipline as the raw-count face); the per-item
# marginals are an item-sized table that joins the pair table through the
# size-aware broadcast policy. Determinism: cosine is rounded to 6 dp and
# the rank order carries a full (cos, p1, p2) tiebreaker chain.
# --------------------------------------------------------------------------
@query(
    "item_item_cosine",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
marg AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_i FROM op GROUP BY 1
),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(count(*) AS BIGINT) AS n_ij
  FROM op a
  JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p1, p2, n_ij, m1.n_i AS n_p1, m2.n_i AS n_p2,
       round(n_ij / sqrt(m1.n_i * m2.n_i), 6) AS cosine_sim
FROM pairs
JOIN marg m1 ON m1.l_partkey = p1
JOIN marg m2 ON m2.l_partkey = p2
ORDER BY cosine_sim DESC, p1, p2
LIMIT 15
""",
)
def item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    marg = op.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("n_i"))
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ij"))
    )
    m1 = broadcast_if_small(
        marg.select(F.col("l_partkey").alias("p1"), F.col("n_i").alias("n_p1"))
    )
    m2 = broadcast_if_small(
        marg.select(F.col("l_partkey").alias("p2"), F.col("n_i").alias("n_p2"))
    )
    return (
        pairs.join(m1, "p1")
        .join(m2, "p2")
        .select(
            "p1",
            "p2",
            "n_ij",
            "n_p1",
            "n_p2",
            F.round(
                F.col("n_ij") / F.sqrt(F.col("n_p1") * F.col("n_p2")), 6
            ).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), "p1", "p2")
        .limit(15)
    )
