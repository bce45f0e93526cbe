"""Time-series queries over the events table.

The reference's "velocity" is simulated incremental batch (SURVEY.md §2.9);
here the time dimension becomes first-class: tumbling/sliding window
aggregation (the batch faces of the Structured Streaming operators in
``streaming/``), event-order analytics via partitioned windows (lag), and
keep-latest dedup.

Scale notes: tumbling windows are plain groupBy on a derived bucket — one
shuffle, partial-aggregated. lag/row_number windows partition by user/entity
key, so state per partition stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.operators.join_policy import local_dim
from f1_bigdata_pyspark_spark.queries.registry import query


# --------------------------------------------------------------------------
# Q: events_hourly — tumbling 1-hour window aggregation (F.window batch face;
# equals date_trunc on aligned windows).
# --------------------------------------------------------------------------
@query(
    "events_hourly",
    oracle="""
SELECT
  date_trunc('hour', ts) AS hour_start,
  event_type,
  count(*) AS n_events,
  round(sum(value), 2) AS sum_value,
  round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
    bench=True,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
        # no trailing display orderBy (r11): order-insensitive hash gate.
    )


# --------------------------------------------------------------------------
# Q: events_sliding — sliding 1h/30m window counts. The oracle enumerates the
# two 30-minute-aligned starts covering each event (the exact semantics of
# Spark's window(slideDuration)).
# --------------------------------------------------------------------------
@query(
    "events_sliding",
    oracle="""
WITH starts AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value FROM events
)
SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM starts
GROUP BY window_start
ORDER BY window_start
""",
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# Q: user_event_gaps — lag over a per-user window: mean inter-event gap in
# seconds (extension of SURVEY.md §2.5, which notes the reference has no
# lag/lead; partitioned window → scales by user key).
# unix micros arithmetic keeps sub-second precision and is ANSI-cast-safe.
# --------------------------------------------------------------------------
@query(
    "user_event_gaps",
    oracle="""
WITH g AS (
  SELECT
    user_id,
    (epoch_us(ts) - epoch_us(lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id))) / 1000000.0 AS gap_s
  FROM events
)
SELECT user_id,
       count(gap_s) AS n_gaps,
       round(avg(gap_s), 6) AS avg_gap_s,
       round(max(gap_s), 6) AS max_gap_s
FROM g
WHERE gap_s IS NOT NULL
GROUP BY user_id
ORDER BY user_id
""",
)
def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    micros = F.unix_micros(F.col("ts"))
    gaps = ev.withColumn(
        "gap_s",
        (micros - F.unix_micros(F.lag("ts").over(w))).cast("double") / F.lit(1e6),
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
            F.round(F.max("gap_s"), 6).alias("max_gap_s"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q: latest_event_per_user — keep-latest dedup (the reference's upsert
# keep-latest semantics, SURVEY.md §7 step 4: row_number over key ordered by
# recency desc).
# --------------------------------------------------------------------------
@query(
    "latest_event_per_user",
    oracle="""
SELECT user_id, event_id, event_type, round(value, 2) AS value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_id", "event_type", F.round("value", 2).alias("value")
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q: event_props_json — semi-structured JSON extraction from the props
# column (extension: the reference stores flat documents only; a training
# pipeline carries JSON sidecars). get_json_object stays JVM-side.
# --------------------------------------------------------------------------
@query(
    "event_props_json",
    oracle="""
SELECT
  event_type,
  count(*) AS n_events,
  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
  CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT)
    AS n_missing_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: value_tier_range_join — non-equi (range) join: each event lands in the
# tier whose [lo, hi) interval contains its value. The tier table is tiny →
# broadcast nested-loop is the right physical join; at 100 TB the fact side
# still never shuffles.
# --------------------------------------------------------------------------
@query(
    "value_tier_range_join",
    oracle="""
SELECT tier, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events
JOIN (VALUES ('micro', 0.0, 1.0), ('small', 1.0, 10.0),
             ('medium', 10.0, 100.0), ('large', 100.0, 1e308))
     AS t(tier, lo, hi)
  ON value >= lo AND value < hi
GROUP BY tier
ORDER BY tier
""",
)
def value_tier_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # local_dim -> LocalRelation with real stats, so the broadcast below is
    # planner-approved (a list-backed frame reports +inf to Catalyst)
    tiers = local_dim(
        spark,
        [
            ("micro", 0.0, 1.0),
            ("small", 1.0, 10.0),
            ("medium", 10.0, 100.0),
            ("large", 100.0, 1e308),
        ],
        ["tier", "lo", "hi"],
    )
    return (
        events.join(
            F.broadcast(tiers),
            (events.value >= tiers.lo) & (events.value < tiers.hi),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("tier")
    )


# --------------------------------------------------------------------------
# Q: events_multires_rollup — hypertable-style continuous aggregate: the
# daily rollup is computed FROM the hourly rollup (sums of sums), not from
# raw events — the scale pattern where each resolution reuses the partials
# of the finer one instead of re-scanning the corpus.
# --------------------------------------------------------------------------
@query(
    "events_multires_rollup",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n_events, sum(value) AS sum_value
  FROM events GROUP BY h, event_type
)
SELECT date_trunc('day', h) AS day, event_type,
       count(*) AS n_hours,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       round(sum(sum_value), 4) AS sum_value
FROM hourly
GROUP BY day, event_type
ORDER BY day, event_type
""",
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    return (
        hourly.groupBy(
            F.date_trunc("day", "h").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 4).alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# Q: skew_safe_event_stats — two-stage salted aggregation over the skewed
# event_type key (operators/skew.salted_agg_counts): stage 1 bounds any
# partition at rows/salt_buckets, stage 2 merges partials. count/sum/min/
# max are associative, so the result is EXACTLY the plain groupBy — which
# is precisely what the oracle states, closing the loop: the skew
# mitigation is proven invisible to results, not just asserted in a test.
# --------------------------------------------------------------------------
@query(
    "skew_safe_event_stats",
    oracle="""
SELECT event_type,
       count(*) AS n_rows,
       round(sum(value), 4) AS sum_v,
       round(min(value), 4) AS min_v,
       round(max(value), 4) AS max_v
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def skew_safe_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.skew import salted_agg_counts

    events = load_table(spark, sf_dir, "events")
    agg = salted_agg_counts(
        events, ["event_type"], "value", salt_buckets=16,
        salt_source=["event_id"],
    )
    return agg.select(
        "event_type",
        "n_rows",
        F.round("sum_v", 4).alias("sum_v"),
        F.round("min_v", 4).alias("min_v"),
        F.round("max_v", 4).alias("max_v"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q: skew_join_hot_users — the skewed-JOIN face next to the salted-agg face
# above: a fact⋈dim join where a known-hot key set would overload its
# shuffle partitions. operators/skew.salted_join_broadcast_hot_keys routes
# the hot keys through a broadcast join (hot dim slice is bounded by the
# hot-key count — broadcastable by construction) and the long tail through
# the normal shuffle join, then unions. The hot set here is detected from
# the fact itself (top-3 users by event count, deterministic user_id
# tie-break) — a 3-row driver hop, the same bounded pattern as runtime
# bloom-filter construction. The oracle is the PLAIN join: like the salted
# agg, the mitigation must be invisible in results. The value sum is
# integer-quantized (milli units) so the split-union's different float
# summation order cannot flip a rounded digit cross-engine.
# At 100 TB this is the classic production incident (one user = 10% of the
# fact) and this query is the repertoire fix; plan shape pinned in
# tests/test_plans.py (hot branch stays BroadcastHashJoin even with
# auto-broadcast disabled, cold branch degrades to shuffle join).
# --------------------------------------------------------------------------
@query(
    "skew_join_hot_users",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
         AS sum_value_milli
FROM events
JOIN customer ON c_custkey = user_id
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def skew_join_hot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.skew import (
        salted_join_broadcast_hot_keys,
    )

    events = load_table(spark, sf_dir, "events").select("user_id", "value")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    hot = [
        r["user_id"]
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id")
        .limit(3)
        .collect()
    ]
    joined = salted_join_broadcast_hot_keys(events, dim, "user_id", hot)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.round(F.col("value") * 1000).cast("long"))
            .cast("long")
            .alias("sum_value_milli"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q: asof_view_before_purchase — point-in-time (AS-OF) join WITH a
# staleness tolerance, the feature-store lookup contract: each purchase
# joins the same user's most recent view at or before it, but a match
# older than 1 hour is treated as absent (a stale feature must not be
# served). operators/asof implements the join as tag → union → per-key
# last(ignorenulls) window — ONE exchange on user_id, no |probes|×|states|
# inequality-join blowup on hot keys — and applies the tolerance as a
# post-window null-out (the ASOF pick itself is unchanged: an old match is
# dropped, NOT replaced by an older one). The oracle is DuckDB's NATIVE
# ASOF LEFT JOIN with the same staleness CASE — an independent
# implementation of the same semantics, including exact-timestamp ties.
# Gap stats are integer-microsecond sums (exact in both engines); the
# average derives from those exact integers with one float division.
# The sibling asof_click_before_purchase exercises the unbounded face.
# --------------------------------------------------------------------------
@query(
    "asof_view_before_purchase",
    oracle="""
WITH v AS (
  SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT p.user_id, p.ts AS pts,
         CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= CAST(3600 AS BIGINT) * 1000000
              THEN v.ts END AS vts
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
)
SELECT CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(vts) AS BIGINT) AS n_with_fresh_view,
       CAST(sum(epoch_us(pts) - epoch_us(vts)) AS BIGINT) AS sum_gap_us,
       CASE WHEN count(vts) = 0 THEN NULL
            ELSE round(CAST(sum(epoch_us(pts) - epoch_us(vts)) AS BIGINT)
                       / count(vts) / 1000000.0, 6) END AS avg_gap_s,
       CAST(max(epoch_us(pts) - epoch_us(vts)) AS BIGINT) AS max_gap_us
FROM j
""",
)
def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events")
    probes = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    # No dedup needed: the carried payload IS the timestamp, so duplicate
    # (user, ts) views are indistinguishable and the match is deterministic
    # without the distinct's extra exchange.
    states = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts"
    ).withColumn("view_ts", F.col("ts"))
    joined = asof_join_backward(
        probes, states, "user_id", "ts", ["view_ts"], tolerance_seconds=3600
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("view_ts"))
    n_matched = F.count("view_ts")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        n_matched.cast("long").alias("n_with_fresh_view"),
        F.sum(gap_us).cast("long").alias("sum_gap_us"),
        F.when(n_matched == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.sum(gap_us).cast("long") / n_matched / 1e6, 6))
        .alias("avg_gap_s"),
        F.max(gap_us).cast("long").alias("max_gap_us"),
    )


# --------------------------------------------------------------------------
# Q: user_state_history — SCD2-style history building: each user's event
# stream becomes validity intervals [valid_from, valid_to) of their
# then-current event_type via lead() over the per-user window — the
# temporal-dimension construction every warehouse needs for point-in-time
# joins. One hash partition on user_id; open intervals carry NULL valid_to.
# Output is aggregated per (event_type) interval stats so the result stays
# compact at any scale.
# --------------------------------------------------------------------------
@query(
    "user_state_history",
    oracle="""
WITH h AS (
  SELECT user_id, event_type,
         epoch_us(ts) AS from_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_us
  FROM events
)
SELECT event_type,
       count(*) AS n_intervals,
       CAST(count(*) - count(to_us) AS BIGINT) AS n_open,
       round(avg((to_us - from_us) / 1000000.0), 3) AS avg_duration_s
FROM h
GROUP BY event_type
ORDER BY event_type
""",
)
def user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    h = ev.select(
        "event_type",
        F.unix_micros("ts").alias("from_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("to_us"),
    )
    return (
        h.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            (F.count(F.lit(1)) - F.count("to_us")).alias("n_open"),
            F.round(
                F.avg((F.col("to_us") - F.col("from_us")) / F.lit(1_000_000.0)),
                3,
            ).alias("avg_duration_s"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: user_event_struct_roundtrip — nested-data construction and
# destructuring: per user, an ORDERED array of (ts, event_type) structs
# built with array_sort(collect_list(struct)) — the document-assembly shape
# that turns row streams into nested training examples — then fields
# extracted back from the first and last elements. Struct values never
# cross the comparison boundary; only destructured scalars do.
# --------------------------------------------------------------------------
@query(
    "user_event_struct_roundtrip",
    oracle="""
WITH a AS (
  SELECT user_id,
         list(struct_pack(ts := epoch_us(ts), et := event_type)
              ORDER BY ts, event_id) AS evs
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(evs) AS BIGINT) AS n_events,
       evs[1].et AS first_type,
       evs[-1].et AS last_type,
       CAST(evs[-1].ts - evs[1].ts AS BIGINT) AS span_us
FROM a ORDER BY user_id
""",
)
def user_event_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # sort key (ts, event_id) leads the struct so array_sort orders exactly
    # like the oracle's ORDER BY ts, event_id
    s = F.struct(
        F.unix_micros("ts").alias("ts"),
        F.col("event_id").alias("eid"),
        F.col("event_type").alias("et"),
    )
    a = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(s)).alias("evs")
    )
    first = F.element_at("evs", 1)
    last = F.element_at("evs", -1)
    return a.select(
        "user_id",
        F.size("evs").cast("long").alias("n_events"),
        first["et"].alias("first_type"),
        last["et"].alias("last_type"),
        (last["ts"] - first["ts"]).alias("span_us"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Q: value_outliers_by_type — z-score anomaly screening: each event's value
# standardized against ITS GROUP's population mean/std (window aggregates
# over event_type — no self-join), then per-type outlier counts at |z|>2
# and |z|>3. The group-stat window is keyed, so state is per-type; at
# scale the same stats come from a pre-aggregated broadcast instead.
# --------------------------------------------------------------------------
@query(
    "value_outliers_by_type",
    oracle="""
WITH s AS (
  SELECT event_type, value,
         avg(value) OVER (PARTITION BY event_type) AS mu,
         stddev_pop(value) OVER (PARTITION BY event_type) AS sigma
  FROM events
), z AS (
  SELECT event_type,
         CASE WHEN sigma = 0 THEN NULL ELSE (value - mu) / sigma END AS z
  FROM s
)
SELECT event_type,
       count(*) AS n_events,
       CAST(count_if(abs(z) > 2) AS BIGINT) AS n_z2,
       CAST(count_if(abs(z) > 3) AS BIGINT) AS n_z3,
       round(max(abs(z)), 6) AS max_abs_z
FROM z
GROUP BY event_type
ORDER BY event_type
""",
)
def value_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.functions.stats import stddev_pop

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    mu = F.avg("value").over(w)
    sigma = stddev_pop(F.col("value")).over(w)
    z = F.when(sigma == 0, F.lit(None)).otherwise(
        (F.col("value") - mu) / sigma
    )
    zs = ev.select("event_type", z.alias("z"))
    return (
        zs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(F.abs("z") > 2).alias("n_z2"),
            F.count_if(F.abs("z") > 3).alias("n_z3"),
            F.round(F.max(F.abs("z")), 6).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: longest_type_streak — gaps-and-islands: the longest run of
# consecutive same-type events per user via the row_number-difference
# trick (global rn minus per-type rn is constant within a run). Two
# windows and two aggregations, all keyed by user — no self-join, no
# iteration.
# --------------------------------------------------------------------------
@query(
    "longest_type_streak",
    oracle="""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn_all,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn_type
  FROM events
), runs AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS streak
  FROM r GROUP BY user_id, event_type, rn_all - rn_type
)
SELECT user_id, streak AS longest_streak, event_type AS streak_type FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY streak DESC, event_type) AS rn
  FROM runs
) WHERE rn = 1
ORDER BY user_id
""",
)
def longest_type_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    r = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    runs = r.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).alias("streak")
    )
    # deterministic argmax: longest streak, ties to lexicographically first
    # type — encoded as min_by over (-streak, type) in BOTH engines
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("streak").alias("longest_streak"),
            F.min_by(
                "event_type", F.struct(-F.col("streak"), F.col("event_type"))
            ).alias("streak_type"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q: value_histogram — equi-width histogram (10 bins over the observed
# global [min, max]): bin = clamp(floor((v - lo) / width), 9), computed
# with the same double arithmetic in both engines. The bounds come from a
# 1-row broadcast aggregate, the binning is a narrow map, and the counts
# partial-aggregate — a single-pass distribution profile at any scale.
# --------------------------------------------------------------------------
@query(
    "value_histogram",
    oracle="""
WITH b AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
), binned AS (
  SELECT least(CAST(floor((value - lo) / ((hi - lo) / 10.0)) AS BIGINT), 9)
           AS bin,
         lo, hi
  FROM events, b
)
SELECT bin,
       count(*) AS n_events,
       round(min(lo) + bin * ((min(hi) - min(lo)) / 10.0), 6) AS bin_lo,
       round(min(lo) + (bin + 1) * ((min(hi) - min(lo)) / 10.0), 6) AS bin_hi
FROM binned
GROUP BY bin
ORDER BY bin
""",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(10.0)
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
            F.lit(9).cast("long"),
        ).alias("bin"),
        "lo",
        "hi",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.min("lo") + F.col("bin") * ((F.min("hi") - F.min("lo")) / 10.0),
                6,
            ).alias("bin_lo"),
            F.round(
                F.min("lo")
                + (F.col("bin") + 1) * ((F.min("hi") - F.min("lo")) / 10.0),
                6,
            ).alias("bin_hi"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Q: incremental_daily_rollup — incremental materialized-view maintenance
# with mergeable partial aggregates: the standing daily rollup state
# (count / sum / sum-of-squares per (day, event_type) for days before a
# cutoff) is MERGED with partials computed over only the new tail — never
# re-scanning history — and the merged result equals a full recompute,
# which is exactly what the oracle runs. count+sum+max are mergeable
# statistics (avg derives from them), the same algebra behind Spark's own
# partial/final HashAggregate split.
# Scale: at 100 TB the "state" side is the stored rollup table (tiny — one
# row per day×type) and only the new partition is scanned; the merge is a
# groupBy over rows proportional to DAYS, not events. This query proves the
# merge algebra end-to-end on one engine pass.
# --------------------------------------------------------------------------
@query(
    "incremental_daily_rollup",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(avg(value), 6) AS avg_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY day, event_type
ORDER BY day, event_type
""",
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")

    def partials(df):
        return df.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.max("value").alias("mx"),
        )

    state = partials(events.filter(F.col("ts") < cutoff))  # standing rollup
    fresh = partials(events.filter(F.col("ts") >= cutoff))  # new batch only
    merged = (
        state.unionByName(fresh)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").alias("s"),
            F.max("mx").alias("mx"),
        )
    )
    mean = F.col("s") / F.col("n_events")
    return merged.select(
        "day",
        "event_type",
        "n_events",
        F.round("s", 2).alias("sum_value"),
        F.round(mean, 6).alias("avg_value"),
        F.round("mx", 2).alias("max_value"),
    ).orderBy("day", "event_type")


# --------------------------------------------------------------------------
# Q: bitmap_distinct_rollup — EXACT mergeable count-distinct via bitmaps:
# users hash into (bucket, bit) positions; per (event_type, day, bucket)
# partial bitmaps are built with bitmap_construct_agg, merged across days
# with bitmap_or_agg, and counted. This is the exact-arithmetic sibling of
# the portable HLL rollup (queries/sketches.py): OR of bitmaps loses
# nothing, so the oracle is plain count(DISTINCT) — a full hash check on a
# sketch-merge pipeline. At 100 TB the daily partial bitmaps are the
# stored rollup state: distinct-users-to-date needs only an OR over tiny
# bitmaps, never a re-scan of raw events (same merge algebra Spark uses
# for its own partial aggregates).
# --------------------------------------------------------------------------
@query(
    "bitmap_distinct_rollup",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    return (
        merged.select("event_type", F.expr("bitmap_count(bm)").alias("c"))
        .groupBy("event_type")
        .agg(F.sum("c").alias("n_users"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: variant_props_stats — the Spark 4 VARIANT face for semi-structured
# JSON: parse_json once into the binary variant encoding, then typed
# variant_get extraction (no per-access re-parse, unlike
# get_json_object — the batch twin of shredded JSON columns at scale).
# The sibling event_props_json covers the string-functions path; this
# pins the variant path to the same oracle semantics.
# --------------------------------------------------------------------------
@query(
    "variant_props_stats",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       CAST(sum(COALESCE(k, 0)) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INTEGER) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
""",
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing"),
            F.sum(F.coalesce(F.col("k"), F.lit(0))).cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: late_arrival_audit — the batch face of watermarking: replay events in
# ARRIVAL order (event_id is the ingest sequence), track the running
# maximum event time, and measure each event's lateness = running_max −
# its own timestamp. Events late beyond the watermark delay are exactly
# the rows a streaming query with that watermark would drop — so this
# audit, per event type, is how you CHOOSE a watermark: the drop rate at
# each candidate delay. Oracle replicates the running max in SQL.
# Scale: the running max is a window over arrival order — global here
# (one sequence); a sharded ingest audits per shard (partition the window
# by shard), which is also the semantically right watermark domain.
# --------------------------------------------------------------------------
@query(
    "late_arrival_audit",
    oracle="""
WITH arr AS (
  SELECT event_type, ts,
         max(ts) OVER (ORDER BY event_id) AS high_water
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN ts < high_water - INTERVAL 2 HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped_at_2h,
       CAST(sum(CASE WHEN ts < high_water - INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped_at_30m,
       round(max(date_diff('second', ts, high_water)) / 3600.0, 6)
         AS max_lateness_h
FROM arr
GROUP BY event_type
ORDER BY event_type
""",
)
def late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    arr = events.select(
        "event_type",
        "ts",
        F.max("ts").over(w).alias("high_water"),
    )
    # Drop conditions at FULL microsecond precision — the oracle's
    # ``ts < high_water - INTERVAL 2 HOUR`` compares whole timestamps, so a
    # second-truncated lateness would miscount events whose lateness lands
    # inside (threshold, threshold + 1 s). max_lateness_h stays in truncated
    # seconds to match the oracle's date_diff('second', ...) semantics
    # (both are truncate-to-second, then subtract).
    late_us = F.unix_micros(F.col("high_water")) - F.unix_micros(F.col("ts"))
    late_s = F.col("high_water").cast("long") - F.col("ts").cast("long")
    return (
        arr.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(late_us > 2 * 3600 * 1_000_000, 1).otherwise(0))
            .cast("long")
            .alias("dropped_at_2h"),
            F.sum(F.when(late_us > 30 * 60 * 1_000_000, 1).otherwise(0))
            .cast("long")
            .alias("dropped_at_30m"),
            F.round(F.max(late_s) / 3600.0, 6).alias("max_lateness_h"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: purchases_by_state_at_time — the POINT-IN-TIME join against an SCD2
# dimension: build validity intervals [from, to) of each user's current
# non-purchase activity state (user_state_history's construction), then
# join every purchase to the interval containing its timestamp — "what
# state was the user in when they bought?". The warehouse-correctness
# pattern as-of joins approximate: here the containment is exact interval
# logic. Physically an EQUI join on user_id with the interval predicate as
# a post-join filter — one exchange per side; per-user interval counts are
# bounded, and a production SCD2 dim is bucketed by the key so the fact
# join is exchange-free. Purchases before the user's first state event
# have no containing interval and are counted as 'no_state' via the left
# join.
# --------------------------------------------------------------------------
@query(
    "purchases_by_state_at_time",
    oracle="""
WITH st AS (
  SELECT user_id, event_type AS state,
         epoch_us(ts) AS from_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_us
  FROM events WHERE event_type <> 'purchase'
),
p AS (
  SELECT user_id, epoch_us(ts) AS p_us, value
  FROM events WHERE event_type = 'purchase'
),
joined AS (
  SELECT p.user_id, p.value, st.state
  FROM p LEFT JOIN st
    ON p.user_id = st.user_id
   AND st.from_us <= p.p_us
   AND (st.to_us IS NULL OR p.p_us < st.to_us)
)
SELECT COALESCE(state, 'no_state') AS state,
       count(*) AS n_purchases,
       round(sum(value), 4) AS total_value
FROM joined
GROUP BY COALESCE(state, 'no_state')
ORDER BY state
""",
)
def purchases_by_state_at_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    st = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.unix_micros("ts").alias("from_us"),
            "ts",
            "event_id",
        )
        .select(
            "user_id",
            "state",
            "from_us",
            F.lead("from_us").over(w).alias("to_us"),
        )
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us"), "value"
    )
    joined = p.join(
        st,
        (p.user_id == st.user_id)
        & (F.col("from_us") <= F.col("p_us"))
        & (F.col("to_us").isNull() | (F.col("p_us") < F.col("to_us"))),
        "left",
    )
    return (
        joined.select(
            F.coalesce(F.col("state"), F.lit("no_state")).alias("state"),
            "value",
        )
        .groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("state")
    )


# --------------------------------------------------------------------------
# Q: regression_full_per_group — the complete per-group OLS readout
# extending slope_per_group (the reference's tyre-degradation slope,
# SURVEY.md A5): slope AND intercept AND R², all from the same one-pass
# sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) — nothing beyond one
# map-side-combined aggregate per group, the textbook "regression at any
# scale" shape (no second pass for residuals: R² = cov²/(var_x·var_y)).
# Built-in regr_* aggregates exist for slope/intercept/r2; the explicit
# form is kept because the sufficient-statistics identity IS the scale
# contract (mergeable partials), and pinned equal to regr_slope in
# tests/test_laps_semantics.py.
# Numerical conditioning: x is CENTERED by a fixed epoch constant before
# aggregating — raw epoch values (~1.7e15 µs) make avg(x²) − avg(x)²
# cancel ~7 significant digits, putting cross-engine slope noise at the
# 6-dp rounding boundary; the shift (slope/R² invariant, intercept
# consistently redefined at the shifted origin on BOTH sides) keeps the
# sums well-conditioned.
# --------------------------------------------------------------------------
@query(
    "regression_full_per_group",
    oracle="""
WITH s AS (
  SELECT event_type,
         count(*) AS n,
         avg((epoch_us(ts) - 1700000000000000) / 1e12) AS avg_x,
         avg(value) AS avg_y,
         avg(((epoch_us(ts) - 1700000000000000) / 1e12) * value) AS avg_xy,
         avg(((epoch_us(ts) - 1700000000000000) / 1e12)
             * ((epoch_us(ts) - 1700000000000000) / 1e12)) AS avg_xx,
         avg(value * value) AS avg_yy
  FROM events
  WHERE value IS NOT NULL
  GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round((avg_xy - avg_x * avg_y) / (avg_xx - avg_x * avg_x), 6)
         AS slope,
       round(avg_y - (avg_xy - avg_x * avg_y) / (avg_xx - avg_x * avg_x)
                     * avg_x, 6) AS intercept,
       round(pow(avg_xy - avg_x * avg_y, 2)
             / ((avg_xx - avg_x * avg_x) * (avg_yy - avg_y * avg_y)), 6)
         AS r2
FROM s
ORDER BY event_type
""",
)
def regression_full_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = (F.unix_micros("ts") - F.lit(1_700_000_000_000_000)) / F.lit(1e12)
    y = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("avg_x"),
        F.avg(y).alias("avg_y"),
        F.avg(x * y).alias("avg_xy"),
        F.avg(x * x).alias("avg_xx"),
        F.avg(y * y).alias("avg_yy"),
    )
    cov = F.col("avg_xy") - F.col("avg_x") * F.col("avg_y")
    var_x = F.col("avg_xx") - F.col("avg_x") * F.col("avg_x")
    var_y = F.col("avg_yy") - F.col("avg_y") * F.col("avg_y")
    slope = cov / var_x
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(F.col("avg_y") - slope * F.col("avg_x"), 6).alias("intercept"),
        F.round(F.pow(cov, 2) / (var_x * var_y), 6).alias("r2"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q: value_ks_drift — two-sample Kolmogorov–Smirnov statistic between the
# purchase and view value distributions: max |ECDF_a − ECDF_b|, the
# standard distribution-drift gate (is this week's metric distributed
# like last week's?). Scale discipline: values are BINNED first
# (round to integer), so the corpus-sized pass is one groupBy(bin) count
# per side; the ECDF cumulative window then runs over the BINNED DOMAIN
# (237 rows here, bounded by the bin grid at any corpus size) — binned KS
# is the standard large-scale practice, and the bin width bounds the
# statistic's error at max bin mass.
# --------------------------------------------------------------------------
@query(
    "value_ks_drift",
    oracle="""
WITH ab AS (
  SELECT round(value, 0) AS v,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
  FROM events
  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
  GROUP BY 1
),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM ab),
cum AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v) * 1.0 / na AS fa,
         sum(cb) OVER (ORDER BY v) * 1.0 / nb AS fb
  FROM ab CROSS JOIN tot
)
SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_purchase,
       CAST((SELECT nb FROM tot) AS BIGINT) AS n_view,
       round(max(abs(fa - fb)), 6) AS ks_statistic
FROM cum
""",
)
def value_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    )
    ab = ev.groupBy(F.round("value", 0).alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("cb"),
    )
    tot = ab.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = ab.join(F.broadcast(tot)).select(
        (F.sum("ca").over(w) / F.col("na")).alias("fa"),
        (F.sum("cb").over(w) / F.col("nb")).alias("fb"),
        "na",
        "nb",
    )
    return cum.agg(
        F.first("na").cast("long").alias("n_purchase"),
        F.first("nb").cast("long").alias("n_view"),
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias(
            "ks_statistic"
        ),
    )


# --------------------------------------------------------------------------
# Q: seasonal_decomposition — classical additive decomposition of the
# daily value series: trend = centered 7-day moving average (computed
# only where the full window exists — edges are NULL, not
# partially-averaged), seasonal = per-day-of-week mean of the detrended
# series, remainder = value − trend − seasonal. Emits the weekly
# seasonal profile plus remainder spread — the drift/anomaly baseline a
# metrics pipeline maintains. Scale: the corpus pass is one daily
# rollup; the moving-average window runs over the BOUNDED day grid
# (#days rows — allowlisted global window, per-series partitioned the
# moment there is a series key), and the rest is two tiny aggregates.
# --------------------------------------------------------------------------
@query(
    "seasonal_decomposition",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1
),
tr AS (
  SELECT day, v,
         CASE WHEN count(*) OVER w = 7
              THEN avg(v) OVER w END AS trend,
         dayofweek(day) + 1 AS dow  -- Spark: Sunday=1..7; DuckDB: Sunday=0..6
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
seas AS (
  SELECT dow, avg(v - trend) AS s, count(*) AS n_days
  FROM tr WHERE trend IS NOT NULL GROUP BY dow
)
SELECT tr.dow,
       CAST(max(seas.n_days) AS BIGINT) AS n_days,
       round(max(seas.s), 6) AS seasonal,
       round(avg(abs(tr.v - tr.trend - seas.s)), 6) AS mean_abs_remainder
FROM tr JOIN seas ON tr.dow = seas.dow
WHERE tr.trend IS NOT NULL
GROUP BY tr.dow
ORDER BY tr.dow
""",
)
def seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "v",
        F.when(F.count(F.lit(1)).over(w) == 7, F.avg("v").over(w)).alias(
            "trend"
        ),
        F.dayofweek("day").alias("dow"),
    ).filter(F.col("trend").isNotNull())
    seas = tr.groupBy("dow").agg(
        F.avg(F.col("v") - F.col("trend")).alias("s"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return (
        tr.join(broadcast_if_small(seas), "dow")
        .groupBy("dow")
        .agg(
            F.max("n_days").cast("long").alias("n_days"),
            F.round(F.max("s"), 6).alias("seasonal"),
            F.round(
                F.avg(F.abs(F.col("v") - F.col("trend") - F.col("s"))), 6
            ).alias("mean_abs_remainder"),
        )
        .orderBy("dow")
    )


# --------------------------------------------------------------------------
# Q: daily_value_interpolation — linear gap imputation on the day grid:
# a deterministic third of the days (day-of-month % 3 = 0) is withheld
# as "sensor outages", and each missing day is rebuilt from its nearest
# observed neighbors: v = prev + (next − prev)·(d − pd)/(nd − pd). The
# imputation twin of daily_revenue_spine's zero-fill — this is what a
# metrics backfill actually does. Determinism: day means are
# 1e-5-quantized BIGINTs (daily_value_acf's ladder); neighbor lookup is
# running last/first over the BOUNDED day grid (≤366 rows — allowlisted
# like the other day-grid globals); the interpolation is one fixed-order
# expression over exact integers. Scale: corpus → day grid in one
# map-side-combinable rollup; everything else is grid-sized.
# --------------------------------------------------------------------------
@query(
    "daily_value_interpolation",
    oracle="""
WITH days AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS svq
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
mq AS (
  SELECT d, CAST(round(svq * 1.0 / (n * 10.0)) AS BIGINT) AS mq,
         CASE WHEN day(d) % 3 = 0 THEN 0 ELSE 1 END AS observed
  FROM days
),
nb AS (
  SELECT d, mq, observed,
         last_value(CASE WHEN observed = 1 THEN mq END IGNORE NULLS)
           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_mq,
         last_value(CASE WHEN observed = 1 THEN d END IGNORE NULLS)
           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_d,
         first_value(CASE WHEN observed = 1 THEN mq END IGNORE NULLS)
           OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_mq,
         first_value(CASE WHEN observed = 1 THEN d END IGNORE NULLS)
           OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_d
  FROM mq
)
SELECT d, round(mq / 100000.0, 6) AS actual_value,
       round((prev_mq + (next_mq - prev_mq)
              * (d - prev_d) * 1.0 / (next_d - prev_d)) / 100000.0, 6)
         AS interp_value,
       CAST(d - prev_d AS BIGINT) AS gap_left_days,
       CAST(next_d - d AS BIGINT) AS gap_right_days
FROM nb
WHERE observed = 0 AND prev_mq IS NOT NULL AND next_mq IS NOT NULL
ORDER BY d
""",
)
def daily_value_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    days = (
        events.filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 1000000).cast("long"))
            .cast("long")
            .alias("svq"),
        )
    )
    mq = days.select(
        "d",
        F.round(F.col("svq") * 1.0 / (F.col("n") * 10.0))
        .cast("long")
        .alias("mq"),
        F.when(F.dayofmonth("d") % 3 == 0, F.lit(0))
        .otherwise(F.lit(1))
        .alias("observed"),
    )
    obs_mq = F.when(F.col("observed") == 1, F.col("mq"))
    obs_d = F.when(F.col("observed") == 1, F.col("d"))
    # bounded global windows over the ≤366-row day grid (allowlisted)
    wb = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    wf = Window.orderBy("d").rowsBetween(1, Window.unboundedFollowing)
    nb = mq.select(
        "d",
        "mq",
        "observed",
        F.last(obs_mq, ignorenulls=True).over(wb).alias("prev_mq"),
        F.last(obs_d, ignorenulls=True).over(wb).alias("prev_d"),
        F.first(obs_mq, ignorenulls=True).over(wf).alias("next_mq"),
        F.first(obs_d, ignorenulls=True).over(wf).alias("next_d"),
    )
    dl = F.datediff(F.col("d"), F.col("prev_d"))
    dr = F.datediff(F.col("next_d"), F.col("d"))
    span = F.datediff(F.col("next_d"), F.col("prev_d"))
    return (
        nb.filter(
            (F.col("observed") == 0)
            & F.col("prev_mq").isNotNull()
            & F.col("next_mq").isNotNull()
        )
        .select(
            "d",
            F.round(F.col("mq") / 100000.0, 6).alias("actual_value"),
            F.round(
                (
                    F.col("prev_mq")
                    + (F.col("next_mq") - F.col("prev_mq")) * dl * 1.0 / span
                )
                / 100000.0,
                6,
            ).alias("interp_value"),
            dl.cast("long").alias("gap_left_days"),
            dr.cast("long").alias("gap_right_days"),
        )
        .orderBy("d")
    )


# --------------------------------------------------------------------------
# Q: piecewise_trend_breakpoint — two-segment linear-trend changepoint:
# fit y = a + b·x separately to days 1..k and k+1..n for EVERY candidate
# breakpoint k, pick the k minimizing total SSE (deterministic tiebreak:
# smallest k). CUSUM finds MEAN shifts; this finds SLOPE breaks — "growth
# stalled on day 17" — the ramp-detection companion. Everything derives
# from integer prefix sums over the bounded day grid: daily totals are
# exact counts, x is the day index, and for any segment [i..j] the OLS
# SSE is a fixed-order closed form over (Σ1, Σx, Σy, Σxy, Σx², Σy²)
# differences of prefix rows — so the per-candidate evaluation is pure
# scalar arithmetic on exact BIGINTs (y ≤ 1e6/day keeps Σy² in int64 to
# ~1e6 days; DECIMAL beyond, stated). The candidate scan is the day grid
# itself (≤366 rows — allowlisted bounded windows), never the corpus.
# --------------------------------------------------------------------------
@query(
    "piecewise_trend_breakpoint",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY d) AS x, y FROM daily
),
pre AS (
  SELECT x, y,
         CAST(sum(x)     OVER w AS BIGINT) AS sx,
         CAST(sum(y)     OVER w AS BIGINT) AS sy,
         CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
         CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
         CAST(sum(y * y) OVER w AS BIGINT) AS syy
  FROM idx
  WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)
),
tot AS (
  SELECT CAST(max(x) AS BIGINT) AS n,
         CAST(max(sx) AS BIGINT) AS tx, CAST(max(sy) AS BIGINT) AS ty,
         CAST(max(sxy) AS BIGINT) AS txy, CAST(max(sxx) AS BIGINT) AS txx,
         CAST(max(syy) AS BIGINT) AS tyy
  FROM pre
),
cand AS (
  SELECT p.x AS k,
         p.sx AS lx, p.sy AS ly, p.sxy AS lxy, p.sxx AS lxx, p.syy AS lyy,
         t.n, t.tx - p.sx AS rx, t.ty - p.sy AS ry,
         t.txy - p.sxy AS rxy, t.txx - p.sxx AS rxx, t.tyy - p.syy AS ryy
  FROM pre p CROSS JOIN tot t
  WHERE p.x >= 2 AND p.x <= t.n - 2
),
scored AS (
  SELECT k,
    (lyy - (ly * ly * 1.0) / k
       - POW(lxy - (lx * ly * 1.0) / k, 2)
         / (lxx - (lx * lx * 1.0) / k)) AS sse_l,
    (ryy - (ry * ry * 1.0) / (n - k)
       - POW(rxy - (rx * ry * 1.0) / (n - k), 2)
         / (rxx - (rx * rx * 1.0) / (n - k))) AS sse_r,
    round((lxy - (lx * ly * 1.0) / k) / (lxx - (lx * lx * 1.0) / k), 6)
      AS slope_left,
    round((rxy - (rx * ry * 1.0) / (n - k))
          / (rxx - (rx * rx * 1.0) / (n - k)), 6) AS slope_right
  FROM cand
),
best AS (
  SELECT k, slope_left, slope_right,
         round(sse_l + sse_r, 4) AS sse_total,
         row_number() OVER (ORDER BY round(sse_l + sse_r, 4) ASC, k ASC)
           AS rn
  FROM scored
)
SELECT k AS breakpoint_day_index, slope_left, slope_right, sse_total
FROM best WHERE rn = 1
""",
)
def piecewise_trend_breakpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.utils import materialize

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    # bounded day-grid windows (allowlisted): index + integer prefix sums
    widx = Window.orderBy("d")
    wrun = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    idx = daily.select(
        F.row_number().over(widx).cast("long").alias("x"), "y"
    )
    pre = materialize(
        idx.select(
            "x",
            F.sum("x").over(wrun).cast("long").alias("sx"),
            F.sum("y").over(wrun).cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).over(wrun).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).over(wrun).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).over(wrun).cast("long").alias("syy"),
        )
    )
    tot = pre.agg(
        F.max("x").cast("long").alias("n"),
        F.max("sx").cast("long").alias("tx"),
        F.max("sy").cast("long").alias("ty"),
        F.max("sxy").cast("long").alias("txy"),
        F.max("sxx").cast("long").alias("txx"),
        F.max("syy").cast("long").alias("tyy"),
    )
    cand = (
        pre.join(F.broadcast(tot))  # 1-row scalar
        .filter((F.col("x") >= 2) & (F.col("x") <= F.col("n") - 2))
    )
    k = F.col("x")
    nr = F.col("n") - k
    lx, ly, lxy, lxx, lyy = (F.col(c) for c in ("sx", "sy", "sxy", "sxx", "syy"))
    rx, ry = F.col("tx") - lx, F.col("ty") - ly
    rxy, rxx = F.col("txy") - lxy, F.col("txx") - lxx
    ryy = F.col("tyy") - lyy
    sl_num, sl_den = lxy - lx * ly * 1.0 / k, lxx - lx * lx * 1.0 / k
    sr_num, sr_den = rxy - rx * ry * 1.0 / nr, rxx - rx * rx * 1.0 / nr
    sse_l = lyy - ly * ly * 1.0 / k - F.pow(sl_num, F.lit(2)) / sl_den
    sse_r = ryy - ry * ry * 1.0 / nr - F.pow(sr_num, F.lit(2)) / sr_den
    scored = cand.select(
        k.alias("k"),
        F.round(sl_num / sl_den, 6).alias("slope_left"),
        F.round(sr_num / sr_den, 6).alias("slope_right"),
        F.round(sse_l + sse_r, 4).alias("sse_total"),
    )
    wbest = Window.orderBy(F.col("sse_total").asc(), F.col("k").asc())
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            F.col("k").alias("breakpoint_day_index"),
            "slope_left",
            "slope_right",
            "sse_total",
        )
    )


# --------------------------------------------------------------------------
# Q: moving_median_daily_revenue — 7-day trailing moving MEDIAN of daily
# order revenue: the robust twin of events_moving_avg (a mean-based moving
# average chases one whale order; the median doesn't — this is the spike-
# resistant smoother an anomaly monitor actually wants). Daily revenue is
# quantized to cents (round 2) BEFORE the median on both engines, so the
# order-unstable double sum can't leak into the median input; the median
# of an exact-valued window is then engine-stable (odd window = element,
# even window = midpoint of two exact values). Scale: one keyed aggregate
# to the day grain, then a rank-6 window over the DAY GRID — calendar-
# bounded cardinality (same class as seasonal_decomposition's 7-day MA),
# allowlisted in the plan audit with that justification.
# --------------------------------------------------------------------------
@query(
    "moving_median_daily_revenue",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT day, revenue,
       round(median(revenue) OVER (
         ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 6) AS mov_median_7d
FROM daily
ORDER BY day
""",
)
def moving_median_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    # Spark disallows median() over a window frame — build the exact
    # median from the frame's sorted value array instead (≤7 elements, so
    # the array is constant-size; stays in codegen).
    w = Window.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("revenue").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2).cast("int") + 1)
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    return daily.select(
        "day",
        "revenue",
        F.round((mid_lo + mid_hi) / 2.0, 6).alias("mov_median_7d"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Q: daily_value_ohlc — per-day open/high/low/close of the event value
# stream (the standard downsampling for any metered series: first/last
# need an ORDER, high/low don't). Open/close are struct-extrema — min/max
# over the lexicographic (ts, event_id, value) tuple, so intra-day ties on
# ts resolve by the unique event id in BOTH engines (min_by alone has
# unspecified tie order — the dup-key lesson from A11) — which keeps the
# whole query ONE map-side-combinable aggregate per day: no window, no
# per-day sort, one exchange on the day key. The oracle states the same
# order with row_number over (ts, event_id).
# --------------------------------------------------------------------------
@query(
    "daily_value_ohlc",
    oracle="""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, ts, event_id, value
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT day, value,
         row_number() OVER (PARTITION BY day ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY day ORDER BY ts DESC, event_id DESC)
           AS rl
  FROM ev
)
SELECT day,
       round(max(CASE WHEN rf = 1 THEN value END), 6) AS open_value,
       round(max(value), 6) AS high_value,
       round(min(value), 6) AS low_value,
       round(max(CASE WHEN rl = 1 THEN value END), 6) AS close_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM ranked
GROUP BY day
ORDER BY day
""",
)
def daily_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "ts",
            "event_id",
            "value",
        )
    )
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    return (
        ev.groupBy("day")
        .agg(
            F.round(first["value"], 6).alias("open_value"),
            F.round(F.max("value"), 6).alias("high_value"),
            F.round(F.min("value"), 6).alias("low_value"),
            F.round(last["value"], 6).alias("close_value"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Q: daily_time_weighted_value — TWAP-style time-weighted daily mean of
# the event value stream: each value holds from its event until the next
# event THAT DAY (segment weight = whole milliseconds of the gap — the
# timestamps carry microseconds, so integer-µs arithmetic with a div-1000
# truncation is the only form both engines state identically; a seconds
# truncation silently disagrees with a fractional epoch()), so a burst of
# readings in one minute no longer dominates the daily mean the way the
# row-weighted average lets it. Per-segment mass is exact integer
# round(value·1e6)·gap_ms, and the DAY SUM is bounded by
# max|v|·1e6 · 86.4e6 ms ≈ 8.6e16 — inside int64 BECAUSE within-day gaps
# sum to at most the day length, regardless of event count. The lead()
# window partitions by DAY — calendar-keyed, horizontally scalable; the
# day's last event has no successor and contributes no segment (stated in
# both engines by the NULL lead filter).
# --------------------------------------------------------------------------
@query(
    "daily_time_weighted_value",
    oracle="""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         epoch_us(ts) AS t, event_id, value
  FROM events WHERE value IS NOT NULL
),
seg AS (
  SELECT day, value,
         lead(t) OVER (PARTITION BY day ORDER BY t, event_id) - t AS gap_us
  FROM ev
),
mass AS (
  SELECT day,
         CAST(round(value * 1000000) AS BIGINT) * (gap_us // 1000) AS vw,
         gap_us // 1000 AS g
  FROM seg WHERE gap_us IS NOT NULL
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(g) AS BIGINT) AS covered_ms,
       round(sum(vw) * 1.0 / sum(g) / 1000000.0, 6) AS twa_value
FROM mass
GROUP BY day
HAVING sum(g) > 0
ORDER BY day
""",
)
def daily_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.unix_micros("ts").alias("t"),
            "event_id",
            "value",
        )
    )
    w = Window.partitionBy("day").orderBy("t", "event_id")
    seg = ev.select(
        "day",
        "value",
        F.expr("(lead(t, 1) OVER (PARTITION BY day ORDER BY t, event_id) - t) div 1000").alias("g"),
    ).filter(F.col("g").isNotNull())
    vw = F.round(F.col("value") * 1000000).cast("long") * F.col("g")
    return (
        seg.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum("g").cast("long").alias("covered_ms"),
            F.round(
                F.sum(vw) * F.lit(1.0) / F.sum("g") / 1000000.0, 6
            ).alias("twa_value"),
        )
        .filter(F.col("covered_ms") > 0)
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Q: event_debounce_stats — telemetry debouncing: collapse same-(user,
# type) events arriving within 5 seconds of the PREVIOUS KEPT event? No —
# the standard relational debounce keeps an event iff it is ≥5 s (integer-µs compare) after
# its immediate predecessor in the same (user, type) stream (lag-gap
# rule: one window pass, no sequential chase; the chase variant needs
# transitive state and is what the sessionization operator provides).
# Readout per event type: raw events, kept events, collapse ratio — the
# dedup dial a telemetry intake reports. One user-keyed exchange.
# --------------------------------------------------------------------------
@query(
    "event_debounce_stats",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
),
gapped AS (
  SELECT event_type,
         t - lag(t) OVER (
           PARTITION BY user_id, event_type ORDER BY t, event_id
         ) AS gap
  FROM ev
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(*) FILTER (WHERE gap IS NULL OR gap >= 5000000) AS BIGINT)
         AS n_kept,
       round(1.0 - CAST(count(*) FILTER (WHERE gap IS NULL OR gap >= 5000000)
                        AS DOUBLE) / count(*), 6) AS collapse_ratio
FROM gapped
GROUP BY event_type
ORDER BY event_type
""",
)
def event_debounce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("t", "event_id")
    gapped = ev.select(
        "event_type", (F.col("t") - F.lag("t", 1).over(w)).alias("gap")
    )
    kept = F.count_if(F.col("gap").isNull() | (F.col("gap") >= 5_000_000))
    return (
        gapped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            kept.cast("long").alias("n_kept"),
            F.round(
                F.lit(1.0)
                - kept.cast("double") / F.count(F.lit(1)),
                6,
            ).alias("collapse_ratio"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: variant_props_rollup — the Spark 4 VARIANT path for semi-structured
# data: props parsed ONCE into the binary variant encoding (parse_json),
# fields read with variant_get. Same answers as the classic
# get_json_object face (event_props_json) — by design: this pins that the
# variant decode path agrees with string-path extraction, the way the
# pipe-syntax face pins the parser. At 100 TB variant is the right
# default: parse once per row into a typed binary, every downstream field
# access is an O(1) path lookup instead of a re-parse of the JSON text.
# --------------------------------------------------------------------------
@query(
    "variant_props_rollup",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS n_distinct_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )
