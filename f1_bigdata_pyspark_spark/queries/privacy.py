"""Privacy / governance / uncertainty queries — the release-side half of a
training-data pipeline (capability-extension scope, north star).

A 100-TB corpus pipeline doesn't only curate data in; it also has to audit
what can safely go OUT: re-identification risk (k-anonymity / l-diversity
over quasi-identifier equivalence classes), noisy aggregate release
(differential-privacy Laplace mechanism), and calibrated uncertainty on
model outputs (split-conformal intervals with a finite-sample coverage
guarantee). Plus the multivariate cousin of the per-group OLS face: a full
multi-feature regression solved from ONE pass of sufficient statistics
(normal equations, centered to a closed-form 2x2 solve) — "ML at any
scale" as a relational plan.

Scale shapes:
- k-anonymity collapses the corpus onto the quasi-identifier lattice
  (|nations| x |segments| x |balance buckets| — bounded by the attribute
  grammar, never by row count); the sensitive-diversity join runs at the
  same bounded grain after a per-class distinct.
- The DP release is one keyed aggregate + a per-GROUP scalar noise term
  (noise is drawn per released cell, not per row — no corpus-sized
  randomness, no RNG: the uniform comes from a salted md5 of the cell key,
  which is exactly how a seeded release harness pins its draws for audit).
- Conformal calibration sorts residuals WITHIN each segment (partitioned
  window): a calibration split is bounded by design in production (you cap
  it — the guarantee needs ~1e3 points per group, not a corpus), so the
  per-group sort never sees 100-TB cardinality.
- The normal-equations face is the canonical sufficient-statistics shape:
  one map-side-combined aggregate (10 sums), then a constant-size linear
  solve in the readout. No second pass, no gradient loop, no driver math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.functions.text import md5_long
from f1_bigdata_pyspark_spark.queries.registry import query

# --------------------------------------------------------------------------
# Q: k_anonymity_audit — re-identification risk readout over the customer
# table: equivalence classes on the quasi-identifier triple (nation,
# market segment, account-balance bucket), class size k, and l-diversity of
# a behavioral sensitive attribute (the set of order priorities the class's
# members have used — joined from orders, NOT a column of the quasi table).
# A class passes when k >= 10 (no individual hides in a crowd smaller than
# 10) and l >= 2 (the sensitive attribute is not constant within the
# class, so membership discloses nothing). This is the audit a dataset
# release runs before publishing "anonymized" rows. Scale: one corpus
# aggregate onto the bounded QI lattice + one custkey-keyed join to orders
# reduced to the same lattice; every float is absent (pure integer counts).
# --------------------------------------------------------------------------
@query(
    "k_anonymity_audit",
    oracle="""
WITH qi AS (
  SELECT c_custkey, c_nationkey,
         c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
  FROM customer
),
classes AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket,
         CAST(count(*) AS BIGINT) AS k_size
  FROM qi GROUP BY c_nationkey, c_mktsegment, bal_bucket
),
sens AS (
  SELECT q.c_nationkey, q.c_mktsegment, q.bal_bucket,
         CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l_diversity
  FROM qi q JOIN orders o ON o.o_custkey = q.c_custkey
  GROUP BY q.c_nationkey, q.c_mktsegment, q.bal_bucket
)
SELECT c.c_nationkey AS nationkey, c.c_mktsegment AS mktsegment,
       c.bal_bucket AS bal_bucket,
       c.k_size,
       COALESCE(s.l_diversity, 0) AS l_diversity,
       c.k_size >= 10 AS k_ok,
       COALESCE(s.l_diversity, 0) >= 2 AS l_ok
FROM classes c LEFT JOIN sens s
  ON s.c_nationkey = c.c_nationkey AND s.c_mktsegment = c.c_mktsegment
 AND s.bal_bucket = c.bal_bucket
ORDER BY 1, 2, 3
""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    qi = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_bucket"),
    )
    classes = qi.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("k_size")
    )
    sens = (
        qi.join(orders, qi.c_custkey == orders.o_custkey)
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.countDistinct("o_orderpriority").alias("l_diversity"))
    )
    return (
        classes.join(sens, ["c_nationkey", "c_mktsegment", "bal_bucket"], "left")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            "bal_bucket",
            "k_size",
            F.coalesce("l_diversity", F.lit(0)).alias("l_diversity"),
            (F.col("k_size") >= 10).alias("k_ok"),
            (F.coalesce("l_diversity", F.lit(0)) >= 2).alias("l_ok"),
        )
        .orderBy("nationkey", "mktsegment", "bal_bucket")
    )


# --------------------------------------------------------------------------
# Q: dp_noisy_event_counts — Laplace-mechanism release of per-event-type
# counts: count + Lap(1/eps) noise with eps = 1 (count queries have
# sensitivity 1 when each row contributes one unit; a user-level guarantee
# would first bound per-user contribution — that cap is the contribution
# clamp every production DP pipeline runs, out of scope for the shape).
# The noise draw is the inverse-CDF transform of a uniform derived from a
# salted md5 of the released CELL KEY — deterministic so the DuckDB oracle
# (and an audit replay) recomputes the exact release; a production run
# swaps the salt for a secret per-release seed and the plan is unchanged.
# noise = -b * sign(u - .5) * ln(1 - 2|u - .5|), u in (0,1).
# Scale: the corpus collapses onto the released cells in one
# map-side-combined count; the noise term is per-cell scalar arithmetic.
# Floats appear only in the per-cell fixed-order readout.
# --------------------------------------------------------------------------
@query(
    "dp_noisy_event_counts",
    oracle="""
WITH counts AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS true_n
  FROM events GROUP BY event_type
),
noised AS (
  SELECT event_type, true_n,
         (CAST(('0x' || substr(md5(event_type || '#dp-release-1'), 1, 15))
               AS BIGINT) + 1) / 1152921504606846977.0 AS u
  FROM counts
)
SELECT event_type,
       round(true_n
             + (-1.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6)
         AS noisy_count
FROM noised
ORDER BY event_type
""",
)
def dp_noisy_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_n"))
    # u in (0,1): (h+1)/(2^60+1); md5_long is always in [0, 2^60)
    u = (
        md5_long(F.concat(F.col("event_type"), F.lit("#dp-release-1"))) + 1
    ) / F.lit(1152921504606846977.0)
    noise = (
        F.lit(-1.0)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return counts.select(
        "event_type",
        F.round(F.col("true_n") + noise, 6).alias("noisy_count"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q: conformal_price_coverage — split-conformal prediction intervals with
# the finite-sample guarantee, per market segment: hash-split orders into
# train/calibration/test (6/2/2), fit the trivial per-segment mean model on
# train, take the ceil(.9(n+1))-th smallest absolute residual on
# calibration as the interval half-width q-hat, and measure empirical
# coverage on test (guaranteed >= 90% in expectation; the boolean uses 85%
# to absorb finite-sample wobble at small SF). Exactness discipline:
# prices are quantized to integer cents BEFORE any cross-row accumulation,
# the model prediction is one fixed-order division rounded back to cents,
# residuals and q-hat are BIGINTs, and the only floats are the final
# coverage divisions. Scale: the calibration sort is a window PARTITIONED
# by segment, and a production calibration split is capped (~1e3 rows per
# group buys the guarantee) — the sort never sees corpus cardinality.
# --------------------------------------------------------------------------
@query(
    "conformal_price_coverage",
    oracle="""
WITH split AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
         CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || '#conf'),
                              1, 15)) AS BIGINT) % 10 AS h
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
model AS (
  SELECT seg, CAST(round(sum(cents) * 1.0 / count(*)) AS BIGINT) AS pred
  FROM split WHERE h < 6 GROUP BY seg
),
cal AS (
  SELECT s.seg, abs(s.cents - m.pred) AS res
  FROM split s JOIN model m ON m.seg = s.seg
  WHERE s.h IN (6, 7)
),
ranked AS (
  SELECT seg, res,
         row_number() OVER (PARTITION BY seg ORDER BY res) AS rn,
         count(*) OVER (PARTITION BY seg) AS n_cal
  FROM cal
),
qhat AS (
  SELECT seg, CAST(max(n_cal) AS BIGINT) AS n_cal, CAST(max(res) AS BIGINT) AS qhat
  FROM ranked
  WHERE rn = least(CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT), n_cal)
  GROUP BY seg
),
test AS (
  SELECT s.seg,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(s.cents - m.pred) <= q.qhat
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM split s
  JOIN model m ON m.seg = s.seg
  JOIN qhat q ON q.seg = s.seg
  WHERE s.h >= 8
  GROUP BY s.seg
)
SELECT t.seg AS mktsegment, q.n_cal, q.qhat AS qhat_cents,
       t.n_test, t.n_covered,
       round(t.n_covered * 1.0 / t.n_test, 6) AS coverage,
       t.n_covered * 1.0 / t.n_test >= 0.85 AS coverage_ok
FROM test t JOIN qhat q ON q.seg = t.seg
ORDER BY mktsegment
""",
)
def conformal_price_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    split = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            (
                md5_long(
                    F.concat(F.col("o_orderkey").cast("string"), F.lit("#conf"))
                )
                % 10
            ).alias("h"),
        )
    )
    model = (
        split.filter(F.col("h") < 6)
        .groupBy("seg")
        .agg(
            F.round(F.sum("cents") / F.count(F.lit(1))).cast("long").alias("pred")
        )
    )
    cal = (
        split.filter(F.col("h").isin(6, 7))
        .join(model, "seg")
        .select("seg", F.abs(F.col("cents") - F.col("pred")).alias("res"))
    )
    w = Window.partitionBy("seg")
    ranked = cal.select(
        "seg",
        "res",
        F.row_number().over(w.orderBy("res")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_cal"),
    )
    qhat = (
        ranked.filter(
            F.col("rn")
            == F.least(
                F.ceil(F.lit(0.9) * (F.col("n_cal") + 1)).cast("long"),
                F.col("n_cal"),
            )
        )
        .groupBy("seg")
        .agg(F.max("n_cal").alias("n_cal"), F.max("res").alias("qhat"))
    )
    test = (
        split.filter(F.col("h") >= 8)
        .join(model, "seg")
        .join(qhat.select("seg", "qhat"), "seg")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("pred")) <= F.col("qhat"), 1
                ).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return (
        test.join(qhat, "seg")
        .select(
            F.col("seg").alias("mktsegment"),
            "n_cal",
            F.col("qhat").alias("qhat_cents"),
            "n_test",
            "n_covered",
            F.round(F.col("n_covered") / F.col("n_test"), 6).alias("coverage"),
            (F.col("n_covered") / F.col("n_test") >= 0.85).alias("coverage_ok"),
        )
        .orderBy("mktsegment")
    )


# --------------------------------------------------------------------------
# Q: ols_price_model — MULTI-feature linear regression from one pass:
# extendedprice ~ quantity + discount (+ intercept), solved by normal
# equations over sufficient statistics (n, and the 9 cross-moments of
# x1/x2/y): centering eliminates the intercept row, leaving a closed-form
# 2x2 solve on the demeaned system in the readout.
# The multivariate extension of regression_full_per_group (single
# feature): the same "one map-side-combined aggregate, constant-size
# solve" contract that trains linear models at any corpus size without a
# gradient loop or a second residual pass. R2 via SSE = Syy − β·X'y.
# Conditioning: quantity in [1,50] and discount in [0,.1] are already
# small and centered enough (no epoch-scale cancellation — the
# regression_full lesson applies to x with |mean| >> stddev, not here).
# Floats appear in avg() sufficient stats (6-dp-rounded readout absorbs
# accumulation-order noise, same policy as every stats face) and the
# fixed-order determinant arithmetic.
# --------------------------------------------------------------------------
@query(
    "ols_price_model",
    oracle="""
WITH s AS (
  SELECT count(*) AS n,
         avg(l_quantity) AS m1, avg(l_discount) AS m2,
         avg(l_extendedprice) AS my,
         avg(l_quantity * l_quantity) AS m11,
         avg(l_quantity * l_discount) AS m12,
         avg(l_discount * l_discount) AS m22,
         avg(l_quantity * l_extendedprice) AS m1y,
         avg(l_discount * l_extendedprice) AS m2y,
         avg(l_extendedprice * l_extendedprice) AS myy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
),
solve AS (
  SELECT n, my, m1, m2, myy, m1y, m2y,
         (m11 - m1 * m1) AS a, (m12 - m1 * m2) AS b,
         (m22 - m2 * m2) AS d,
         (m1y - m1 * my) AS p, (m2y - m2 * my) AS q
  FROM s
),
beta AS (
  SELECT n, my, m1, m2, myy, m1y, m2y, p, q,
         (p * d - q * b) / (a * d - b * b) AS b1,
         (q * a - p * b) / (a * d - b * b) AS b2
  FROM solve
)
SELECT CAST(n AS BIGINT) AS n,
       round(b1, 6) AS beta_quantity,
       round(b2, 6) AS beta_discount,
       round(my - b1 * m1 - b2 * m2, 6) AS intercept,
       round((b1 * p + b2 * q) / (myy - my * my), 6) AS r2
FROM beta
""",
)
def ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull()
        & F.col("l_discount").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x1).alias("m1"),
        F.avg(x2).alias("m2"),
        F.avg(y).alias("my"),
        F.avg(x1 * x1).alias("m11"),
        F.avg(x1 * x2).alias("m12"),
        F.avg(x2 * x2).alias("m22"),
        F.avg(x1 * y).alias("m1y"),
        F.avg(x2 * y).alias("m2y"),
        F.avg(y * y).alias("myy"),
    )
    # centered second moments: the 2x2 normal system on demeaned features
    a = F.col("m11") - F.col("m1") * F.col("m1")
    b = F.col("m12") - F.col("m1") * F.col("m2")
    d = F.col("m22") - F.col("m2") * F.col("m2")
    p = F.col("m1y") - F.col("m1") * F.col("my")
    q = F.col("m2y") - F.col("m2") * F.col("my")
    det = a * d - b * b
    b1 = (p * d - q * b) / det
    b2 = (q * a - p * b) / det
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(b1, 6).alias("beta_quantity"),
        F.round(b2, 6).alias("beta_discount"),
        F.round(
            F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 6
        ).alias("intercept"),
        F.round(
            (b1 * p + b2 * q) / (F.col("myy") - F.col("my") * F.col("my")), 6
        ).alias("r2"),
    )
