"""Scalar/aggregate function-family breadth queries.

The reference's scalar surface is tiny (arithmetic + casts, SURVEY.md §2.8);
these queries pin the wider families a general engine must get right —
dispersion aggregates (pop vs samp, the stddev_pop trap from SURVEY.md §7),
string functions, and array (higher-order) functions over the embedding
column. All stay JVM-side in whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.queries.registry import query


# --------------------------------------------------------------------------
# Q: dispersion_family — population vs sample variance/stddev side by side
# (the reference deliberately uses stddev_pop; DuckDB's bare stddev is
# sample — this query pins all four so the distinction can never silently
# flip).
# --------------------------------------------------------------------------
@query(
    "dispersion_family",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(avg(o_totalprice), 4) AS mean_price,
       round(var_pop(o_totalprice), 2) AS var_pop_price,
       round(var_samp(o_totalprice), 2) AS var_samp_price,
       round(stddev_pop(o_totalprice), 4) AS std_pop_price,
       round(stddev_samp(o_totalprice), 4) AS std_samp_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def dispersion_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("mean_price"),
            F.round(F.var_pop("o_totalprice"), 2).alias("var_pop_price"),
            F.round(F.var_samp("o_totalprice"), 2).alias("var_samp_price"),
            F.round(F.stddev_pop("o_totalprice"), 4).alias("std_pop_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("std_samp_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q: string_functions_probe — substring/case/trim/replace/levenshtein over
# documents, aggregated per source so the result is small and stable.
# --------------------------------------------------------------------------
@query(
    "string_functions_probe",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       round(avg(length(upper(text))), 4) AS avg_len,
       round(avg(length(replace(text, ' ', ''))), 4) AS avg_len_nospace,
       round(avg(levenshtein(substr(text, 1, 10), 'spark scan')), 4)
         AS avg_lev10,
       min(trim(substr(text, 1, 5))) AS min_prefix
FROM documents
GROUP BY source
ORDER BY source
""",
)
def string_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length(F.upper("text"))), 4).alias("avg_len"),
            F.round(
                F.avg(F.length(F.regexp_replace("text", " ", ""))), 4
            ).alias("avg_len_nospace"),
            F.round(
                F.avg(
                    F.levenshtein(F.substring("text", 1, 10), F.lit("spark scan"))
                ),
                4,
            ).alias("avg_lev10"),
            F.min(F.trim(F.substring("text", 1, 5))).alias("min_prefix"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q: embedding_component_stats — array higher-order functions over the
# embedding column, all JVM-side: element access, array max/min, and a
# lambda reduction (sum of squares) via F.aggregate.
# --------------------------------------------------------------------------
@query(
    "embedding_component_stats",
    oracle="""
SELECT label,
       count(*) AS n_vecs,
       round(avg(embedding[1]), 6) AS avg_first,
       round(avg(list_aggregate(embedding, 'max')), 6) AS avg_max,
       round(avg(list_aggregate(embedding, 'min')), 6) AS avg_min,
       round(avg(list_sum(list_transform(embedding, x -> x * x))), 6)
         AS avg_sumsq
FROM embeddings
GROUP BY label
ORDER BY label
""",
)
def embedding_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "e", F.col("embedding").cast("array<double>")
    )
    sumsq = F.aggregate(
        "e", F.lit(0.0), lambda acc, x: acc + x * x
    )
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(F.element_at("e", 1)), 6).alias("avg_first"),
            F.round(F.avg(F.array_max("e")), 6).alias("avg_max"),
            F.round(F.avg(F.array_min("e")), 6).alias("avg_min"),
            F.round(F.avg(sumsq), 6).alias("avg_sumsq"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Q: datetime_argmax_probe — calendar + argmax/boolean aggregate families:
# year/quarter extraction, last_day, add_months, ISO day-of-week,
# count_if, bool_and/bool_or, min_by/max_by (keyed on the UNIQUE order key
# — an argmax with a non-unique key is engine-dependent on ties).
# Spark weekday() is Monday=0, DuckDB isodow is Monday=1: aligned by +1.
# --------------------------------------------------------------------------
@query(
    "datetime_argmax_probe",
    oracle="""
SELECT
  year(o_orderdate) AS yr,
  quarter(o_orderdate) AS qtr,
  count(*) AS n_orders,
  CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
  bool_and(o_totalprice > 0) AS all_positive,
  round(min_by(o_totalprice, o_orderkey), 2) AS first_order_price,
  round(max_by(o_totalprice, o_orderkey), 2) AS last_order_price,
  min(CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)) AS first_month_end,
  max(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)) AS last_plus_3m,
  max(isodow(o_orderdate)) AS max_isodow
FROM orders
GROUP BY yr, qtr ORDER BY yr, qtr
""",
)
def datetime_argmax_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        orders.groupBy(
            F.year(d).alias("yr"), F.quarter(d).alias("qtr")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.round(F.min_by("o_totalprice", "o_orderkey"), 2).alias(
                "first_order_price"
            ),
            F.round(F.max_by("o_totalprice", "o_orderkey"), 2).alias(
                "last_order_price"
            ),
            F.min(F.last_day(d)).alias("first_month_end"),
            F.max(F.add_months(d, 3)).alias("last_plus_3m"),
            F.max(F.weekday(d) + F.lit(1)).alias("max_isodow"),
        )
        .orderBy("yr", "qtr")
    )


# --------------------------------------------------------------------------
# Q: collect_agg_probe — set-collection aggregates surfaced as ARRAY
# columns: sorted distinct element lists are deterministic (collect_set's
# raw order is not — always sort before exposing), and the driver hash
# compares them structurally.
# --------------------------------------------------------------------------
@query(
    "collect_agg_probe",
    oracle="""
SELECT o_orderpriority,
       list_sort(list(DISTINCT o_orderstatus)) AS statuses,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
         AS statuses_csv,
       CAST(len(list(DISTINCT o_orderstatus)) AS BIGINT) AS n_statuses,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def collect_agg_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    statuses = F.array_sort(F.collect_set("o_orderstatus"))
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            statuses.alias("statuses"),
            # canonical scalar twin of the array column: if a hasher ever
            # treats ARRAY values engine-specifically, the CSV form still
            # pins the identical content
            F.array_join(statuses, ",").alias("statuses_csv"),
            F.size(statuses).cast("long").alias("n_statuses"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q: map_functions_probe — map-typed column family: build a per-row map
# (create_map), merge in extra entries (map_concat), read via element_at,
# and expose the sorted key set (map_keys). The Spark route runs entirely
# through MapType expressions; the oracle states the equivalent scalar
# semantics — map values never cross the comparison boundary, only their
# extracted contents, so the check is engine-portable.
# --------------------------------------------------------------------------
@query(
    "map_functions_probe",
    oracle="""
SELECT o_orderstatus AS status,
       o_orderpriority AS priority,
       count(*) AS n_orders,
       'priority,status,tier' AS map_keys_csv,
       CASE WHEN o_totalprice > 200000 THEN 'high' ELSE 'normal' END AS tier
FROM orders
GROUP BY status, priority, tier
ORDER BY status, priority, tier
""",
)
def map_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    tier = F.when(F.col("o_totalprice") > 200000, F.lit("high")).otherwise(
        F.lit("normal")
    )
    m = F.map_concat(base, F.create_map(F.lit("tier"), tier))
    enriched = orders.select(
        F.element_at(m, "status").alias("status"),
        F.element_at(m, "priority").alias("priority"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("map_keys_csv"),
        F.element_at(m, "tier").alias("tier"),
    )
    return (
        enriched.groupBy("status", "priority", "tier", "map_keys_csv")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select("status", "priority", "n_orders", "map_keys_csv", "tier")
        .orderBy("status", "priority", "tier")
    )


# --------------------------------------------------------------------------
# Q: window_family_probe — the remaining ranking/navigation window
# functions in one query: cume_dist, nth_value (frame-anchored), and
# first/last value over an explicit frame — per-priority windows over the
# post-aggregation supplier totals (tiny partitions, per the
# rank-after-reduce rule).
# --------------------------------------------------------------------------
@query(
    "window_family_probe",
    oracle="""
WITH t AS (
  SELECT o_orderpriority AS prio, o_custkey,
         round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY prio, o_custkey
)
SELECT prio, o_custkey, spend,
       round(cume_dist() OVER w, 6) AS cd,
       round(nth_value(spend, 2) OVER (PARTITION BY prio
             ORDER BY spend DESC, o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
         AS second_spend,
       round(first_value(spend) OVER (PARTITION BY prio
             ORDER BY spend DESC, o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
         AS top_spend
FROM t
WINDOW w AS (PARTITION BY prio ORDER BY spend, o_custkey)
ORDER BY prio, spend DESC, o_custkey
LIMIT 50
""",
)
def window_family_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    t = orders.groupBy(
        F.col("o_orderpriority").alias("prio"), "o_custkey"
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    w_asc = Window.partitionBy("prio").orderBy("spend", "o_custkey")
    w_full = (
        Window.partitionBy("prio")
        .orderBy(F.col("spend").desc(), F.col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t.select(
            "prio",
            "o_custkey",
            "spend",
            F.round(F.cume_dist().over(w_asc), 6).alias("cd"),
            F.round(F.nth_value("spend", 2).over(w_full), 2).alias(
                "second_spend"
            ),
            F.round(F.first("spend").over(w_full), 2).alias("top_spend"),
        )
        .orderBy("prio", F.col("spend").desc(), "o_custkey")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Q: robust_dispersion_mad — median absolute deviation per group: the
# robust twin of stddev (insensitive to the outliers value_outliers_by_type
# hunts). Two exact medians — group median, then median of absolute
# deviations after a co-keyed join — both engines compute the same exact
# (interpolated) median.
# --------------------------------------------------------------------------
@query(
    "robust_dispersion_mad",
    oracle="""
WITH med AS (
  SELECT event_type, median(value) AS m FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, abs(e.value - med.m) AS ad
  FROM events e JOIN med ON e.event_type = med.event_type
)
SELECT d.event_type,
       count(*) AS n_events,
       round(min(med.m), 6) AS median_value,
       round(median(d.ad), 6) AS mad
FROM dev d JOIN med ON d.event_type = med.event_type
GROUP BY d.event_type
ORDER BY d.event_type
""",
)
def robust_dispersion_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "m", F.abs(F.col("value") - F.col("m")).alias("ad")
    )
    return (
        dev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("m"), 6).alias("median_value"),
            F.round(F.median("ad"), 6).alias("mad"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: user_activity_entropy — Shannon entropy of each user's event-type
# distribution (how diverse is their activity), then per-entropy-decile
# user counts so the output stays bounded. Entropy = -sum(p ln p) from the
# per-(user, type) counts — two keyed aggregations, exact double math in
# both engines, rounded.
# --------------------------------------------------------------------------
@query(
    "user_activity_entropy",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
), tot AS (
  SELECT user_id, sum(n) AS t FROM c GROUP BY user_id
), ent AS (
  SELECT c.user_id,
         round(-sum((n * 1.0 / t) * ln(n * 1.0 / t)), 6) AS entropy
  FROM c JOIN tot ON c.user_id = tot.user_id
  GROUP BY c.user_id
)
SELECT CAST(floor(entropy * 5) AS BIGINT) AS entropy_bucket,
       count(*) AS n_users,
       round(min(entropy), 6) AS min_entropy,
       round(max(entropy), 6) AS max_entropy
FROM ent
GROUP BY entropy_bucket
ORDER BY entropy_bucket
""",
)
def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("user_id").agg(F.sum("n").alias("t"))
    p = F.col("n").cast("double") / F.col("t").cast("double")
    ent = (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )
    return (
        ent.groupBy(
            F.floor(F.col("entropy") * 5).cast("long").alias("entropy_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.min("entropy"), 6).alias("min_entropy"),
            F.round(F.max("entropy"), 6).alias("max_entropy"),
        )
        .orderBy("entropy_bucket")
    )


# --------------------------------------------------------------------------
# Q: trimmed_mean_by_type — the GROUPED_AGG pandas UDF slot (a custom
# AGGREGATE in Python, the one Arrow-batched UDF tier not covered by the
# mapInPandas / applyInPandas / UDTF faces): 10% trimmed mean of event
# value per type, a robust-statistics aggregate Spark has no built-in
# for. Arrow ships each group's values to one numpy call; trimming is
# count-based on the value-sorted array (k = floor(n/10) off each end),
# so equal values make the trim order-insensitive and the oracle can
# restate it with rank arithmetic. GROUPED_AGG partials do NOT map-side
# combine (the whole group's values reach one worker) — fine for
# bounded-cardinality groups like these; an unbounded-group robust mean
# at 100 TB would use the approx-percentile clip instead
# (value_outliers_by_type shows that shape).
# --------------------------------------------------------------------------
@query(
    "trimmed_mean_by_type",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
  WHERE value IS NOT NULL
)
SELECT event_type,
       CAST(any_value(n) AS BIGINT) AS n_values,
       round(avg(value) FILTER (rn > n // 10 AND rn <= n - n // 10), 6)
         AS trimmed_mean
FROM ranked
GROUP BY event_type
ORDER BY event_type
""",
)
def trimmed_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: this module runs under postponed annotations
    # (PEP 563), which turns type hints into strings pandas_udf can't
    # infer GROUPED_AGG from
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean(v):
        import numpy as np

        vals = np.sort(v.to_numpy(dtype="float64"))
        k = len(vals) // 10
        kept = vals[k : len(vals) - k] if k else vals
        return float(np.mean(kept))

    # Catalyst refuses to mix pandas and JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas agg too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_vals(v):
        return len(v)

    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return (
        events.groupBy("event_type")
        .agg(
            n_vals("value").alias("n_values"),
            F.round(trimmed_mean("value"), 6).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: ansi_try_functions_probe — the error-safe arithmetic family
# (try_divide / try_cast / try_add / try_to_number): under ANSI SQL mode a
# division by zero or an overflow ABORTS the job — at 100 TB, one corrupt
# row killing a 6-hour pipeline is the failure mode these exist to
# prevent; try_* returns NULL instead and the audit counts them. Probed
# over real data: zero-denominator guarded division on lineitem discounts
# and a deliberately overflowing add, with per-flag NULL accounting the
# oracle restates with CASE guards.
# --------------------------------------------------------------------------
@query(
    "ansi_try_functions_probe",
    oracle="""
WITH t AS (
  SELECT l_returnflag,
         CASE WHEN l_discount = 0 THEN NULL
              ELSE l_extendedprice / l_discount END AS ratio,
         CASE WHEN l_quantity > 0
              THEN CAST(l_quantity AS BIGINT) ELSE NULL END AS q
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN ratio IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_guarded,
       round(avg(ratio), 4) AS avg_ratio,
       CAST(sum(q) AS BIGINT) AS sum_qty
FROM t
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def ansi_try_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ratio = F.try_divide(F.col("l_extendedprice"), F.col("l_discount"))
    q = F.when(
        F.col("l_quantity") > 0, F.col("l_quantity").cast("long")
    ).otherwise(F.lit(None))
    return (
        li.select("l_returnflag", ratio.alias("ratio"), q.alias("q"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("ratio").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_div_guarded"),
            F.round(F.avg("ratio"), 4).alias("avg_ratio"),
            F.sum("q").cast("long").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q: collation_casefold_groups — Spark 4 string COLLATIONS: grouping and
# distinct-counting under UTF8_LCASE collation, the declarative
# alternative to sprinkling lower() through every comparison (and, unlike
# lower(), collation-aware comparisons keep the ORIGINAL strings in the
# output). The oracle states the same semantics with explicit lower();
# group labels are canonicalized to lower case in both engines so the
# faces hash-match. Probed over customer market segments re-cased
# deterministically per row — the messy-categorical reality of crawled
# data.
# --------------------------------------------------------------------------
@query(
    "collation_casefold_groups",
    oracle="""
WITH messy AS (
  SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
              WHEN c_custkey % 3 = 1 THEN upper(c_mktsegment)
              ELSE c_mktsegment END AS seg,
         c_acctbal
  FROM customer
)
SELECT lower(seg) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT seg) AS BIGINT) AS n_raw_casings,
       round(sum(c_acctbal), 2) AS total_balance
FROM messy
GROUP BY lower(seg)
ORDER BY segment
""",
)
def collation_casefold_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    messy = cust.select(
        F.when(
            F.col("c_custkey") % 3 == 0, F.lower("c_mktsegment")
        )
        .when(F.col("c_custkey") % 3 == 1, F.upper("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        "c_acctbal",
    )
    folded = F.expr("seg COLLATE UTF8_LCASE")
    return (
        messy.groupBy(folded.alias("seg_ci"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct(F.expr("seg COLLATE UTF8_BINARY")).alias(
                "n_raw_casings"
            ),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .select(
            F.lower(F.col("seg_ci")).cast("string").alias("segment"),
            "n_customers",
            "n_raw_casings",
            "total_balance",
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Q: cogroup_user_attribution — the COGROUPED_MAP Arrow tier (two
# DataFrames grouped on the same key, each key's PAIR of groups in one
# Python call): per-user purchase/click attribution — purchase count/value,
# click count, and purchases after the user's last click. The logic here is
# deliberately also SQL-expressible (the oracle is the join form) so the
# tier gets a full value-hash check; the tier itself is for per-entity
# logic that isn't relational (sequence alignment, per-user session
# stitching across streams). Scale: one user_id exchange per side — the
# same two shuffles the join form pays — then pair-aligned Arrow batches;
# state is bounded by the largest single user's events.
# --------------------------------------------------------------------------
@query(
    "cogroup_user_attribution",
    oracle="""
WITH p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
),
pa AS (
  SELECT user_id, count(*) AS n_purchases,
         round(sum(value), 4) AS purchase_value
  FROM p GROUP BY user_id
),
ca AS (
  SELECT user_id, count(*) AS n_clicks, max(ts) AS last_click
  FROM c GROUP BY user_id
),
aft AS (
  SELECT p.user_id, count(*) AS n_after
  FROM p LEFT JOIN ca ON p.user_id = ca.user_id
  WHERE ca.last_click IS NULL OR p.ts > ca.last_click
  GROUP BY p.user_id
)
SELECT COALESCE(pa.user_id, ca.user_id) AS user_id,
       COALESCE(pa.n_purchases, 0) AS n_purchases,
       COALESCE(ca.n_clicks, 0) AS n_clicks,
       COALESCE(pa.purchase_value, 0.0) AS purchase_value,
       COALESCE(aft.n_after, 0) AS n_after_last_click
FROM pa
FULL JOIN ca ON pa.user_id = ca.user_id
LEFT JOIN aft ON COALESCE(pa.user_id, ca.user_id) = aft.user_id
ORDER BY user_id
""",
)
def cogroup_user_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.grouped_map import (
        cogroup_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    return cogroup_attribution(purchases, clicks).orderBy("user_id")


# --------------------------------------------------------------------------
# Q: union_schema_drift — the reference's schema-tolerance semantics (F8:
# `if "col" in df.columns`) at SET level: append a batch written under an
# OLDER schema (no lang column) to a newer one with
# `unionByName(allowMissingColumns=True)` — missing columns NULL-fill
# instead of erroring, the multi-season append path when the schema
# evolved between seasons. Oracle = DuckDB's UNION ALL BY NAME. The NULL
# bucket in the rollup is exactly the old-schema rows — drift stays
# VISIBLE in the output rather than silently defaulted.
# --------------------------------------------------------------------------
@query(
    "union_schema_drift",
    oracle="""
WITH old_batch AS (
  SELECT doc_id, n_chars FROM documents WHERE doc_id % 10 < 3
),
new_batch AS (
  SELECT doc_id, n_chars, lang FROM documents WHERE doc_id % 10 >= 3
),
unioned AS (
  SELECT * FROM old_batch UNION ALL BY NAME SELECT * FROM new_batch
)
SELECT COALESCE(lang, '<pre-schema>') AS lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM unioned
GROUP BY COALESCE(lang, '<pre-schema>')
ORDER BY lang
""",
)
def union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    old_batch = docs.filter(F.col("doc_id") % 10 < 3).select("doc_id", "n_chars")
    new_batch = docs.filter(F.col("doc_id") % 10 >= 3).select(
        "doc_id", "n_chars", "lang"
    )
    unioned = old_batch.unionByName(new_batch, allowMissingColumns=True)
    return (
        unioned.groupBy(
            F.coalesce(F.col("lang"), F.lit("<pre-schema>")).alias("lang")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q: weighted_median_price_by_brand — exact WEIGHTED median: the price at
# which half the shipped QUANTITY sits below (not half the rows — the
# difference is the whole point of weighting). Per brand: order rows by
# (price, linenumber-chain tiebreak), running quantity weight, first row
# whose cumulative weight reaches half the brand total. Windows partition
# by brand; weights and cents are exact BIGINTs; the half-total threshold
# compares integers ONLY (2·cum ≥ total — no float midpoint). The
# distinct shape vs price_quantiles_by_brand: that face interpolates
# row-median; this one answers inventory questions ("the median shipped
# unit cost"). Scale: one brand-keyed exchange, no self-join.
# --------------------------------------------------------------------------
@query(
    "weighted_median_price_by_brand",
    oracle="""
WITH j AS (
  SELECT p.p_brand,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l.l_quantity AS BIGINT) AS qty,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
cum AS (
  SELECT p_brand, cents, qty,
         sum(qty) OVER (PARTITION BY p_brand
                        ORDER BY cents, l_orderkey, l_linenumber
                        ROWS UNBOUNDED PRECEDING) AS cw,
         sum(qty) OVER (PARTITION BY p_brand) AS total_w
  FROM j
),
hit AS (
  SELECT p_brand, cents, total_w,
         row_number() OVER (PARTITION BY p_brand ORDER BY cw, cents) AS rn
  FROM cum WHERE 2 * cw >= total_w
)
SELECT p_brand, CAST(total_w AS BIGINT) AS total_qty,
       round(cents / 100.0, 2) AS weighted_median_price
FROM hit WHERE rn = 1
ORDER BY p_brand
""",
)
def weighted_median_price_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from f1_bigdata_pyspark_spark.operators.join_policy import (
        broadcast_if_small,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(broadcast_if_small(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    wrun = (
        Window.partitionBy("p_brand")
        .orderBy("cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("p_brand")
    cum = j.select(
        "p_brand",
        "cents",
        F.sum("qty").over(wrun).alias("cw"),
        F.sum("qty").over(wall).alias("total_w"),
    )
    whit = Window.partitionBy("p_brand").orderBy("cw", "cents")
    return (
        cum.filter(2 * F.col("cw") >= F.col("total_w"))
        .withColumn("rn", F.row_number().over(whit))
        .filter(F.col("rn") == 1)
        .select(
            "p_brand",
            F.col("total_w").cast("long").alias("total_qty"),
            F.round(F.col("cents") / 100.0, 2).alias("weighted_median_price"),
        )
        .orderBy("p_brand")
    )
