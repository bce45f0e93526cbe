"""Join / set-operation queries (capability extension — SURVEY.md §2.7:
the reference has zero joins; they enter through the star-schema testdata).

Scale notes: every dimension here (region/nation/customer/supplier/part) is
broadcast explicitly — at 100 TB the fact table never shuffles for these
joins; only the final small aggregate exchanges. Semi/anti joins use the
dedicated join types (no distinct-then-join detour).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.queries.registry import query
from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small


# --------------------------------------------------------------------------
# Q: revenue_by_nation — the TPC-H Q5-shaped star join:
# lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, aggregate revenue.
# --------------------------------------------------------------------------
@query(
    "revenue_by_nation",
    oracle="""
SELECT
  n_name,
  count(*) AS n_items,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('AMERICA', 'ASIA')
  AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    bench=True,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("AMERICA", "ASIA")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(broadcast_if_small(customer), F.col("o_custkey") == customer.c_custkey, "inner")
        .join(broadcast_if_small(nation), F.col("c_nationkey") == nation.n_nationkey, "inner")
        .join(broadcast_if_small(region), F.col("n_regionkey") == region.r_regionkey, "inner")
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --------------------------------------------------------------------------
# Q: customers_without_orders — anti join (NOT EXISTS): customers with no
# premium (>400k) order. (Every customer has *some* order in the synthetic
# data, so the unfiltered anti join would be vacuous.)
# --------------------------------------------------------------------------
@query(
    "customers_without_orders",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    premium = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        customer.join(premium, customer.c_custkey == premium.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q: customers_with_big_orders — semi join (EXISTS).
# --------------------------------------------------------------------------
@query(
    "customers_with_big_orders",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers, round(avg(c_acctbal), 6) AS avg_acctbal
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    return (
        customer.join(
            big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q: union_active_customers — union + distinct set semantics (reference's
# multi-season append pattern, SURVEY.md §7 step 3).
# --------------------------------------------------------------------------
@query(
    "union_active_customers",
    oracle="""
WITH u AS (
  SELECT o_custkey FROM orders WHERE o_totalprice > 150000
  UNION
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
)
SELECT count(*) AS n_customers FROM u
""",
)
def union_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    high_value = orders.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        high_value.unionByName(recent)
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Q: part_supplier_join — mid-size broadcast join with projection pruning
# (only 2 of part's 6 columns should reach the scan).
# --------------------------------------------------------------------------
@query(
    "part_supplier_join",
    oracle="""
SELECT p_brand, s_name, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size >= 25
GROUP BY p_brand, s_name
ORDER BY p_brand, s_name
""",
)
def part_supplier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(broadcast_if_small(part), li.l_partkey == part.p_partkey, "inner")
        .join(broadcast_if_small(supplier), li.l_suppkey == supplier.s_suppkey, "inner")
        .groupBy("p_brand", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("p_brand", "s_name")
    )


# --------------------------------------------------------------------------
# Q: pagerank_suppliers — iterative graph algorithm as unrolled dataflow:
# 3 PageRank iterations (damping 0.85) over the co-supplier graph (edge
# between suppliers shipping the same part; symmetric, so there are no
# dangling nodes and the plain update rule is exact). The Spark side
# builds the iteration by LOOP-UNROLLING into one declarative plan — the
# idiomatic Spark form for a FIXED iteration count (contrast
# operators/graph.connected_components, which iterates to convergence
# with checkpoints); the oracle unrolls the same three steps as chained
# CTEs. Rounding happens ONCE at the end so iteration arithmetic is
# bit-comparable.
# Scale: each iteration is one shuffle on dst (map-side combined sum);
# the rank and degree tables are O(#suppliers) — broadcastable; the edge
# table partitions by src and is reused across iterations (at 100 TB
# you'd checkpoint it once, as the docstring of graph.py discusses).
# --------------------------------------------------------------------------
@query(
    "pagerank_suppliers",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM pairs a JOIN pairs b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
n AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM n) AS pr FROM nodes),
r1 AS (
  SELECT e.dst AS node,
         0.15 / (SELECT n FROM n)
         + 0.85 * sum(r0.pr / deg.outdeg) AS pr
  FROM edges e JOIN r0 ON r0.node = e.src JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
r2 AS (
  SELECT e.dst AS node,
         0.15 / (SELECT n FROM n)
         + 0.85 * sum(r1.pr / deg.outdeg) AS pr
  FROM edges e JOIN r1 ON r1.node = e.src JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
r3 AS (
  SELECT e.dst AS node,
         0.15 / (SELECT n FROM n)
         + 0.85 * sum(r2.pr / deg.outdeg) AS pr
  FROM edges e JOIN r2 ON r2.node = e.src JOIN deg ON deg.src = e.src
  GROUP BY e.dst
)
SELECT node AS s_suppkey, round(pr, 6) AS pagerank
FROM r3
ORDER BY pagerank DESC, s_suppkey ASC
LIMIT 20
""",
)
def pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    a = pairs.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("src")
    )
    b = pairs.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("dst")
    )
    edges = (
        a.join(b, "pk")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    from f1_bigdata_pyspark_spark.utils import materialize

    edges = materialize(edges)  # reused by deg + all three iterations
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # driver-side scalar: the PageRank base constant
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    contrib_edges = edges.join(F.broadcast(deg), "src")
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(3):
        pr = (
            contrib_edges.join(
                F.broadcast(pr), pr.node == contrib_edges.src
            )
            .groupBy("dst")
            .agg(
                (
                    F.lit(0.15 / n)
                    + F.lit(0.85) * F.sum(F.col("pr") / F.col("outdeg"))
                ).alias("pr")
            )
            .select(F.col("dst").alias("node"), "pr")
        )
    return (
        pr.select(
            F.col("node").alias("s_suppkey"), F.round("pr", 6).alias("pagerank")
        )
        .orderBy(F.col("pagerank").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )
