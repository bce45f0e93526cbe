"""Sketch-based approximate aggregates (Apache DataSketches HLL, built into
Spark ≥3.5 as ``hll_sketch_agg``/``hll_union_agg``).

At 100 TB exact COUNT(DISTINCT) is a full shuffle of every distinct value;
an HLL sketch is a few KB per group, map-side combinable, and — the part
that matters operationally — MERGEABLE: per-partition/per-day sketches
union into exact-shape global estimates without touching raw data again.
``sketch_merge_rollup`` demonstrates exactly that pattern (daily sketches →
union → global estimate), the sketch twin of ``events_multires_rollup``.

The DataSketches estimates are engine/seed-specific, so their DECLARED
faces state exact distincts plus within-tolerance booleans (oracle asserts
TRUE) and the raw estimates are additionally pinned in
``tests/test_sketches.py`` (≤2% relative error, far looser than HLL's
actual guarantee at lgK=12). ``portable_hll_users_by_type`` is the
counterpoint: a from-scratch HLL over portable md5-derived hashes whose
estimate IS deterministic, and therefore oracle-checked bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.queries.registry import query


# --------------------------------------------------------------------------
# Q: hll_users_by_type — per-group approximate distinct via HLL sketch,
# alongside HLL++ (approx_count_distinct) for comparison. The raw
# estimates are engine/seed-specific, so the DECLARED face states the
# exact distinct plus within-tolerance booleans (2% for DataSketches at
# lgK=12, 5% = default rsd for HLL++) — the oracle asserts TRUE, putting
# the sketches' error budgets under the driver's value-hash gate (same
# contract pattern as approx_quantile_accuracy). The raw estimates stay
# pinned in tests/test_sketches.py.
# --------------------------------------------------------------------------
@query(
    "hll_users_by_type",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       TRUE AS sketch_within_2pct,
       TRUE AS hllpp_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id").cast("double")
    sketch = F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("double")
    hllpp = F.approx_count_distinct("user_id").cast("double")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            (F.abs(sketch - exact) <= 0.02 * exact).alias("sketch_within_2pct"),
            (F.abs(hllpp - exact) <= 0.05 * exact).alias("hllpp_within_5pct"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: sketch_merge_rollup — build per-day HLL sketches, then MERGE them into
# the global distinct-user estimate; the rollup row is produced purely
# from the daily sketch table. The declared face adds the exact global
# distinct (one extra aggregate — at 100 TB you would NOT run it; it
# exists here only to state the merged estimate's 2% budget as an
# oracle-checkable boolean).
# --------------------------------------------------------------------------
@query(
    "sketch_merge_rollup",
    oracle="""
SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       count(DISTINCT user_id) AS n_users,
       TRUE AS merged_within_2pct
FROM events
""",
)
def sketch_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
    )
    exact = events.agg(F.countDistinct("user_id").alias("n_users"))
    return merged.join(F.broadcast(exact)).select(
        "n_days",
        "n_users",
        (
            F.abs(F.col("est").cast("double") - F.col("n_users").cast("double"))
            <= 0.02 * F.col("n_users").cast("double")
        ).alias("merged_within_2pct"),
    )


# --------------------------------------------------------------------------
# Q: portable_hll_users_by_type — a from-scratch HyperLogLog (p=8, 256
# registers) whose every step is PORTABLE math: bucket and remaining bits
# from the md5-derived 60-bit hash, rho = leading zeros via the length of
# the binary representation, register max per bucket, bias-corrected
# harmonic estimate with the linear-counting small-range branch. Unlike the
# DataSketches queries above, the estimate is a deterministic function of
# the data — the DuckDB oracle computes the BIT-IDENTICAL estimate, putting
# even approximate distinct counting under the value-hash gate. Same
# mergeable register layout as any HLL: max per (group, bucket) partials
# combine map-side.
# --------------------------------------------------------------------------
_HLL_ALPHA_256 = 0.7182725932495458  # alpha_m = 0.7213 / (1 + 1.079/m)


@query(
    "portable_hll_users_by_type",
    oracle="""
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS x
  FROM events
), b AS (
  SELECT event_type, x % 256 AS bucket, x // 256 AS w FROM h
), r AS (
  SELECT event_type, bucket,
         max(CASE WHEN w = 0 THEN 53 ELSE 52 - length(bin(w)) + 1 END) AS rho
  FROM b GROUP BY event_type, bucket
), est AS (
  SELECT event_type, count(*) AS nb, sum(pow(2.0, -rho)) AS s
  FROM r GROUP BY event_type
)
SELECT event_type,
       round(
         CASE WHEN (CAST(0.7182725932495458 AS DOUBLE) * 65536.0
                    / (s + (256 - nb))) <= 640.0 AND nb < 256
              THEN 256.0 * ln(256.0 / (256 - nb))
              ELSE CAST(0.7182725932495458 AS DOUBLE) * 65536.0
                   / (s + (256 - nb))
         END, 4) AS hll_estimate
FROM est ORDER BY event_type
""",
)
def portable_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.functions.text import md5_long

    events = load_table(spark, sf_dir, "events")
    x = md5_long(F.col("user_id").cast("string"))
    hashed = events.select(
        "event_type", (x % 256).alias("bucket"), x.alias("x")
    )
    w = F.expr("x DIV 256")
    rho = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(52) - F.length(F.bin(w)) + F.lit(1)
    )
    regs = (
        hashed.select("event_type", "bucket", rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    est = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
    )
    raw = (
        F.lit(_HLL_ALPHA_256)
        * F.lit(65536.0)
        / (F.col("s") + (F.lit(256) - F.col("nb")))
    )
    linear = F.lit(256.0) * F.log(F.lit(256.0) / (F.lit(256) - F.col("nb")))
    estimate = F.when((raw <= 640.0) & (F.col("nb") < 256), linear).otherwise(raw)
    return est.select(
        "event_type", F.round(estimate, 4).alias("hll_estimate")
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q: portable_hll_merge_rollup — the MERGE face of the portable HLL: build
# per-day register tables (max rho per bucket), then merge days by taking
# the bucket-wise max again — registers are a max-semilattice, so the
# merged estimate equals the estimate over the union without re-scanning
# raw data. Deterministic end to end; the oracle replays both levels.
# --------------------------------------------------------------------------
@query(
    "portable_hll_merge_rollup",
    oracle="""
WITH h AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS x
  FROM events
), b AS (
  SELECT day, x % 256 AS bucket, x // 256 AS w FROM h
), daily AS (
  SELECT day, bucket,
         max(CASE WHEN w = 0 THEN 53 ELSE 52 - length(bin(w)) + 1 END) AS rho
  FROM b GROUP BY day, bucket
), merged AS (
  SELECT bucket, max(rho) AS rho FROM daily GROUP BY bucket
), est AS (
  SELECT count(*) AS nb, sum(pow(2.0, -rho)) AS s FROM merged
)
SELECT (SELECT count(DISTINCT day) FROM daily) AS n_days,
       round(
         CASE WHEN (CAST(0.7182725932495458 AS DOUBLE) * 65536.0
                    / (s + (256 - nb))) <= 640.0 AND nb < 256
              THEN 256.0 * ln(256.0 / (256 - nb))
              ELSE CAST(0.7182725932495458 AS DOUBLE) * 65536.0
                   / (s + (256 - nb))
         END, 4) AS total_users_estimate
FROM est
""",
)
def portable_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.functions.text import md5_long

    events = load_table(spark, sf_dir, "events")
    x = md5_long(F.col("user_id").cast("string"))
    hashed = events.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        (x % 256).alias("bucket"),
        x.alias("x"),
    )
    w = F.expr("x DIV 256")
    rho = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(52) - F.length(F.bin(w)) + F.lit(1)
    )
    daily = (
        hashed.select("day", "bucket", rho.alias("rho"))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    # n_days stays in the plan (1-row broadcast), no driver-side action
    days = daily.agg(F.countDistinct("day").alias("n_days"))
    merged = daily.groupBy("bucket").agg(F.max("rho").alias("rho"))
    est = merged.agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
    ).crossJoin(F.broadcast(days))
    raw = (
        F.lit(_HLL_ALPHA_256)
        * F.lit(65536.0)
        / (F.col("s") + (F.lit(256) - F.col("nb")))
    )
    linear = F.lit(256.0) * F.log(F.lit(256.0) / (F.lit(256) - F.col("nb")))
    estimate = F.when((raw <= 640.0) & (F.col("nb") < 256), linear).otherwise(raw)
    return est.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.round(estimate, 4).alias("total_users_estimate"),
    )


# --------------------------------------------------------------------------
# Q: countmin_heavy_hitters — a Count-Min sketch (depth 3 × width 64, the
# streaming frequency-estimation sketch) built relationally over portable
# md5 row-hashes: each event increments one counter per row, counters are
# a groupBy-sum (map-side combinable, mergeable across partitions/days
# exactly like the HLL faces above), and a key's estimate is the MIN over
# its row counters. CM guarantees no undercount (est ≥ true count), stated
# as a driver-checked boolean per key; estimates here are exact-match
# oracle values because the hash is engine-portable. At 100 TB the sketch
# is d×w integers of shared state — the frequency answer when the key
# cardinality is too large for an exact groupBy, with heavy hitters read
# back by probing candidate keys (here: the event types themselves).
# --------------------------------------------------------------------------
@query(
    "countmin_heavy_hitters",
    oracle="""
WITH probes AS (
  SELECT event_type, r.r AS r,
         CAST('0x' || substr(md5(event_type || '#' || CAST(r.r AS VARCHAR)),
              1, 15) AS BIGINT) % 64 AS col
  FROM events CROSS JOIN range(3) AS r(r)
),
counters AS (
  SELECT r, col, count(*) AS cnt FROM probes GROUP BY r, col
),
exact AS (
  SELECT event_type, count(*) AS exact_n FROM events GROUP BY event_type
),
cand AS (
  SELECT event_type, r.r AS r,
         CAST('0x' || substr(md5(event_type || '#' || CAST(r.r AS VARCHAR)),
              1, 15) AS BIGINT) % 64 AS col
  FROM exact CROSS JOIN range(3) AS r(r)
),
est AS (
  SELECT event_type, min(cnt) AS cm_estimate
  FROM cand JOIN counters USING (r, col)
  GROUP BY event_type
)
SELECT e.event_type,
       CAST(x.exact_n AS BIGINT) AS exact_n,
       CAST(e.cm_estimate AS BIGINT) AS cm_estimate,
       e.cm_estimate >= x.exact_n AS no_undercount
FROM est e JOIN exact x USING (event_type)
ORDER BY event_type
""",
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.functions.text import md5_long

    DEPTH, WIDTH = 3, 64

    def col_for(key, r):
        return md5_long(F.concat_ws("#", key, r.cast("string"))) % WIDTH

    ev = load_table(spark, sf_dir, "events").select("event_type")
    probes = ev.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(DEPTH - 1))).alias("r"),
    ).select("r", col_for(F.col("event_type"), F.col("r")).alias("col"))
    counters = probes.groupBy("r", "col").agg(F.count(F.lit(1)).alias("cnt"))
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    cand = exact.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(DEPTH - 1))).alias("r"),
    ).select(
        "event_type", "r", col_for(F.col("event_type"), F.col("r")).alias("col")
    )
    est = (
        cand.join(F.broadcast(counters), ["r", "col"])  # ≤ DEPTH×WIDTH rows
        .groupBy("event_type")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cm_estimate").cast("long").alias("cm_estimate"),
            (F.col("cm_estimate") >= F.col("exact_n")).alias("no_undercount"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: kmv_user_overlap — SET-OPERATION cardinality from mergeable sketches:
# a K-minimum-values (theta) sketch per cohort (1995 vs 1996 buyers,
# k = 64 smallest md5-derived hashes of the custkey), union by re-minning,
# and the standard KMV estimators: |S| ≈ (k-1)·2^60 / kth_min_hash,
# |A∩B| ≈ (|KMV_union ∩ KMV_A ∩ KMV_B| / k) · est_union. Intersection
# membership is tested against the SKETCHES only — sound because
# θ_union ≤ min(θ_A, θ_B), so every union-sketch element lies below both
# per-set thresholds, where sketch membership equals set membership.
# This is the audience-overlap question (retention, cross-sell, dedup
# across crawls) answered from two 64-row summaries instead of a
# re-shuffle of raw keys — the set-algebra power HLL alone lacks.
# Hashes are portable md5 math, so ESTIMATES are oracle-checked exactly,
# not just bounded; the _ok booleans state the accuracy contract
# (k = 64 → RSE ≈ 1/√62 ≈ 13%).
# --------------------------------------------------------------------------
_KMV_K = 64


@query(
    "kmv_user_overlap",
    oracle=f"""
WITH a_h AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
         AS BIGINT) AS h
  FROM orders WHERE year(o_orderdate) = 1995
),
b_h AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
         AS BIGINT) AS h
  FROM orders WHERE year(o_orderdate) = 1996
),
kmv_a AS (SELECT h FROM a_h ORDER BY h LIMIT {_KMV_K}),
kmv_b AS (SELECT h FROM b_h ORDER BY h LIMIT {_KMV_K}),
u_h AS (SELECT h FROM kmv_a UNION SELECT h FROM kmv_b),
kmv_u AS (SELECT h FROM u_h ORDER BY h LIMIT {_KMV_K}),
est AS (
  SELECT ({_KMV_K} - 1) * 1152921504606846976.0
           / CAST((SELECT max(h) FROM kmv_a) AS DOUBLE) AS est_a,
         ({_KMV_K} - 1) * 1152921504606846976.0
           / CAST((SELECT max(h) FROM kmv_b) AS DOUBLE) AS est_b,
         ({_KMV_K} - 1) * 1152921504606846976.0
           / CAST((SELECT max(h) FROM kmv_u) AS DOUBLE) AS est_u,
         (SELECT count(*) FROM kmv_u
          WHERE h IN (SELECT h FROM kmv_a)
            AND h IN (SELECT h FROM kmv_b)) AS rho
),
exact AS (
  SELECT (SELECT count(*) FROM a_h) AS n_a,
         (SELECT count(*) FROM b_h) AS n_b,
         (SELECT count(*) FROM (SELECT h FROM a_h UNION SELECT h FROM b_h))
           AS n_union,
         (SELECT count(*) FROM a_h WHERE h IN (SELECT h FROM b_h))
           AS n_inter
)
SELECT CAST(n_a AS BIGINT) AS n_a_exact,
       CAST(n_b AS BIGINT) AS n_b_exact,
       CAST(n_union AS BIGINT) AS union_exact,
       round(est_u, 2) AS union_est,
       CAST(n_inter AS BIGINT) AS inter_exact,
       round(rho * est_u / {_KMV_K}, 2) AS inter_est,
       abs(est_u - n_union) <= 0.35 * n_union AS union_ok,
       abs(rho * est_u / {_KMV_K} - n_inter) <= 0.5 * n_inter AS inter_ok
FROM est, exact
""",
)
def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.functions.text import md5_long

    orders = load_table(spark, sf_dir, "orders")
    h = md5_long(F.col("o_custkey").cast("string")).alias("h")

    def hashes(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select(h)
            .distinct()
        )

    a_h, b_h = hashes(1995), hashes(1996)
    kmv_a = a_h.orderBy("h").limit(_KMV_K)
    kmv_b = b_h.orderBy("h").limit(_KMV_K)
    kmv_u = kmv_a.union(kmv_b).distinct().orderBy("h").limit(_KMV_K)

    theta = F.lit(float(2**60))

    def est_of(kmv: DataFrame, name: str) -> DataFrame:
        return kmv.agg(
            ((_KMV_K - 1) * theta / F.max("h").cast("double")).alias(name)
        )

    rho = (
        kmv_u.join(kmv_a, "h", "left_semi")
        .join(kmv_b, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("rho"))
    )
    exact = (
        a_h.withColumn("in_a", F.lit(1))
        .join(b_h.withColumn("in_b", F.lit(1)), "h", "full")
        .agg(
            F.sum("in_a").cast("long").alias("n_a_exact"),
            F.sum("in_b").cast("long").alias("n_b_exact"),
            F.count(F.lit(1)).alias("union_exact"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias(
                "inter_exact"
            ),
        )
    )
    inter_est = F.col("rho") * F.col("est_u") / _KMV_K
    return (
        exact.crossJoin(F.broadcast(est_of(kmv_a, "est_a")))
        .crossJoin(F.broadcast(est_of(kmv_b, "est_b")))
        .crossJoin(F.broadcast(est_of(kmv_u, "est_u")))
        .crossJoin(F.broadcast(rho))
        .select(
            "n_a_exact",
            "n_b_exact",
            "union_exact",
            F.round("est_u", 2).alias("union_est"),
            "inter_exact",
            F.round(inter_est, 2).alias("inter_est"),
            (
                F.abs(F.col("est_u") - F.col("union_exact"))
                <= 0.35 * F.col("union_exact")
            ).alias("union_ok"),
            (
                F.abs(inter_est - F.col("inter_exact"))
                <= 0.5 * F.col("inter_exact")
            ).alias("inter_ok"),
        )
    )


# --------------------------------------------------------------------------
# Q: sliding_hll_distinct_users — the CONTINUOUS-AGGREGATE composition of
# the portable HLL: per-day register tables, then each day's trailing-7-day
# distinct-user estimate by bucket-wise max over the window of daily
# registers — the hypertable "sliding cardinality" readout. The raw scan
# happens ONCE (building daily registers); every window after that merges
# 256-row register tables, so a year of sliding windows re-reads sketches,
# not events. The exact trailing count is computed beside it (day spine ×
# events range join — broadcastable spine) and the estimate is fully
# deterministic, so BOTH columns sit under the value hash, not a
# tolerance. Scale: daily register table is days × ≤256 rows regardless
# of corpus size; the exact column is the expensive one at 100 TB and
# exists here as the verification twin.
# --------------------------------------------------------------------------
@query(
    "sliding_hll_distinct_users",
    oracle="""
WITH h AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS x
  FROM events
), daily AS (
  SELECT day, x % 256 AS bucket,
         max(CASE WHEN x // 256 = 0 THEN 53
                  ELSE 52 - length(bin(x // 256)) + 1 END) AS rho
  FROM h GROUP BY day, bucket
), days AS (SELECT DISTINCT day FROM daily),
win AS (
  SELECT d.day, dl.bucket, max(dl.rho) AS rho
  FROM days d JOIN daily dl
    ON dl.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day, dl.bucket
), est AS (
  SELECT day, count(*) AS nb, sum(pow(2.0, -rho)) AS s FROM win GROUP BY day
), exact AS (
  SELECT d.day, count(DISTINCT e.user_id) AS n_exact
  FROM days d JOIN events e
    ON CAST(date_trunc('day', e.ts) AS DATE)
       BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
)
SELECT est.day,
       round(CASE WHEN (CAST(0.7182725932495458 AS DOUBLE) * 65536.0
                        / (s + (256 - nb))) <= 640.0 AND nb < 256
                  THEN 256.0 * ln(256.0 / (256 - nb))
                  ELSE CAST(0.7182725932495458 AS DOUBLE) * 65536.0
                       / (s + (256 - nb))
             END, 4) AS hll_trailing_7d,
       CAST(n_exact AS BIGINT) AS exact_trailing_7d
FROM est JOIN exact ON est.day = exact.day
ORDER BY est.day
""",
)
def sliding_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.functions.text import md5_long
    from f1_bigdata_pyspark_spark.utils import materialize

    events = load_table(spark, sf_dir, "events")
    x = md5_long(F.col("user_id").cast("string"))
    hashed = events.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        (x % 256).alias("bucket"),
        x.alias("x"),
    )
    w = F.expr("x DIV 256")
    rho = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(52) - F.length(F.bin(w)) + F.lit(1)
    )
    daily = materialize(
        hashed.select("day", "bucket", rho.alias("rho"))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    days = daily.select("day").distinct()
    # trailing-7-day register merge: day-spine × daily registers range join
    # (the spine is tiny — broadcast — so this is a narrow map over the
    # register table, never over events)
    win = (
        F.broadcast(days.withColumnRenamed("day", "wday"))
        .join(
            daily,
            (F.col("day") <= F.col("wday"))
            & (F.col("day") >= F.date_sub(F.col("wday"), 6)),
        )
        .groupBy("wday", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    est = win.groupBy("wday").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
    )
    raw = (
        F.lit(_HLL_ALPHA_256)
        * F.lit(65536.0)
        / (F.col("s") + (F.lit(256) - F.col("nb")))
    )
    linear = F.lit(256.0) * F.log(F.lit(256.0) / (F.lit(256) - F.col("nb")))
    estimate = F.when(
        (raw <= 640.0) & (F.col("nb") < 256), linear
    ).otherwise(raw)
    ev_day = events.select(
        F.date_trunc("day", "ts").cast("date").alias("eday"), "user_id"
    )
    exact = (
        F.broadcast(days.withColumnRenamed("day", "wday"))
        .join(
            ev_day,
            (F.col("eday") <= F.col("wday"))
            & (F.col("eday") >= F.date_sub(F.col("wday"), 6)),
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_trailing_7d"))
    )
    return (
        est.join(exact, "wday")
        .select(
            F.col("wday").alias("day"),
            F.round(estimate, 4).alias("hll_trailing_7d"),
            "exact_trailing_7d",
        )
        .orderBy("day")
    )
