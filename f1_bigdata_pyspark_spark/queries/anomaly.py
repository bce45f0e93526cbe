"""Change detection and interval analytics over the event stream.

Capability extensions beyond the reference's batch aggregations (its only
temporal notion is per-race batch ingest, ``ingest_season_laps.py:121-147``):
the classic monitoring operators a production event pipeline runs
continuously, each expressed relationally so the sequential-looking state
(CUSUM recursion, interval counters, exponential smoothing) becomes window
functions / bounded equi-joins that scale horizontally.

- value_cusum_changepoint: one-sided CUSUM per event type WITHOUT the
  sequential ``S_t = max(0, S_{t-1} + d_t)`` recursion — the drawdown
  identity ``S_t = P_t - min_{0<=j<=t} P_j`` (P = prefix sum of the
  drift-adjusted deltas, P_0 = 0) turns it into two running windows over
  one partition. Determinism note: deltas are quantized to INTEGER
  micro-units (1e-6) before the prefix pass — windowed float sums are
  NOT order-stable across engines (DuckDB's segment-tree window
  aggregation adds in a different order than Spark's running frame;
  measured: a 1e-6 rounding-boundary flip at sf0.01), while integer
  prefix sums are exact in any order. The quantization is the metric's
  spec, not a fudge; at 10^12-row partitions the int64 headroom bound
  (|delta| < 9e18 / n) would pick a coarser unit.
- concurrent_sessions_peak: sweep-line interval concurrency — sessions
  become (+1 at start, -1 at end) deltas; a running sum ordered by
  (time, delta) gives the live-session count, its max the peak. The
  ``delta`` tiebreak closes a session that ends exactly when another
  starts BEFORE the new one opens (back-to-back sessions never overlap).
- ewma_value_profile: bounded-lookback EWMA (alpha = 1/2, 20 events) as a
  banded self-join — each event equi-joins its previous <=19 rows via an
  exploded offset sequence (exactly 20x amplification, never the per-user
  quadratic blow-up a range join would risk). alpha = 1/2 on purpose:
  2^-k weights are exact binary doubles, so both engines weight
  identically.

Scale notes (100 TB): every window partitions by event_type / user_id /
day — state never crosses an executor and the only shuffles are those
hash exchanges. The EWMA offset explode is a fixed 20x on an
already-reduced (user, rn, value) projection; at corpus scale the same
shape feeds from the sessionized stream instead of re-sorting raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.queries.registry import query

_GAP_US = 30 * 60 * 1_000_000  # same 30-min inactivity gap as user_sessions


# --------------------------------------------------------------------------
# Q: value_cusum_changepoint — one-sided CUSUM change detection per event
# type via the prefix-sum/running-min identity (no sequential recursion).
# Slack k = sd/2 (standard half-sigma tuning), alarm threshold h = 3*sd.
# --------------------------------------------------------------------------
@query(
    "value_cusum_changepoint",
    oracle="""
WITH stats AS (
  SELECT event_type,
         round(avg(value), 6) AS mu,
         round(stddev_pop(value), 6) AS sd
  FROM events GROUP BY event_type
), p AS (
  SELECT e.event_type, epoch_us(e.ts) AS ts_us, e.event_id, s.sd,
         sum(CAST(round((e.value - s.mu - s.sd / 2) * 1000000.0) AS BIGINT))
           OVER (
           PARTITION BY e.event_type ORDER BY e.ts, e.event_id
           ROWS UNBOUNDED PRECEDING
         ) AS pre
  FROM events e JOIN stats s USING (event_type)
), c AS (
  SELECT event_type, ts_us, event_id, sd,
         pre - least(min(pre) OVER (
           PARTITION BY event_type ORDER BY ts_us, event_id
           ROWS UNBOUNDED PRECEDING
         ), 0) AS s_t
  FROM p
), ranked AS (
  SELECT event_type, ts_us,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY s_t DESC, ts_us ASC) AS rnk
  FROM c
), agg AS (
  SELECT event_type,
         count(*) AS n_events,
         round(max(s_t) / 1000000.0, 6) AS max_cusum,
         CAST(sum(CASE WHEN s_t > 3000000.0 * sd THEN 1 ELSE 0 END)
              AS BIGINT) AS n_alarms
  FROM c GROUP BY event_type
)
SELECT a.event_type, a.n_events, a.max_cusum,
       r.ts_us AS peak_ts_us, a.n_alarms
FROM agg a JOIN ranked r ON r.event_type = a.event_type AND r.rnk = 1
ORDER BY a.event_type
""",
)
def value_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_pop("value"), 6).alias("sd"),
    )
    from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small

    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined = ev.select(
        "event_type", F.unix_micros("ts").alias("ts_us"), "event_id", "value"
    ).join(broadcast_if_small(stats), "event_type")
    delta_us = F.round(
        (F.col("value") - F.col("mu") - F.col("sd") / 2) * 1000000.0, 0
    ).cast("long")
    p = joined.withColumn("pre", F.sum(delta_us).over(run))
    c = p.withColumn(
        "s_t",
        F.col("pre") - F.least(F.min("pre").over(run), F.lit(0).cast("long")),
    )
    from f1_bigdata_pyspark_spark.utils import materialize

    # one CUSUM pass feeds both the aggregate and the peak-row pick
    c = materialize(
        c.select("event_type", "ts_us", "sd", "s_t")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("s_t").desc(), F.col("ts_us").asc()
    )
    peak = (
        c.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") == 1)
        .select("event_type", F.col("ts_us").alias("peak_ts_us"))
    )
    agg = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max("s_t") / 1000000.0, 6).alias("max_cusum"),
        F.sum(
            F.when(F.col("s_t") > 3000000.0 * F.col("sd"), 1).otherwise(0)
        ).alias("n_alarms"),
    )
    return (
        agg.join(peak, "event_type")
        .select(
            "event_type", "n_events", "max_cusum", "peak_ts_us", "n_alarms"
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: concurrent_sessions_peak — sweep-line peak concurrency per day:
# sessionize (30-min gap, same spec as user_sessions), emit +/-1 deltas at
# session start/end, running-sum per start-day. Sessions count toward the
# day they START (a session is one interval; splitting it across midnight
# would double-count it in the per-day n_sessions).
# --------------------------------------------------------------------------
@query(
    "concurrent_sessions_peak",
    oracle=f"""
WITH o AS (
  SELECT user_id, ts, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
  FROM events
), f AS (
  SELECT user_id, ts, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > {_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM o
), s AS (
  SELECT user_id, ts, ts_us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM f
), g AS (
  SELECT user_id, sess,
         CAST(date_trunc('day', min(ts)) AS DATE) AS day,
         min(ts_us) AS start_us, max(ts_us) AS end_us
  FROM s GROUP BY user_id, sess
), deltas AS (
  SELECT day, start_us AS us, 1 AS delta FROM g
  UNION ALL
  SELECT day, end_us AS us, -1 AS delta FROM g
), run AS (
  SELECT day, delta,
         sum(delta) OVER (PARTITION BY day ORDER BY us, delta
                          ROWS UNBOUNDED PRECEDING) AS live
  FROM deltas
)
SELECT day,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions,
       CAST(max(live) AS BIGINT) AS peak_concurrency
FROM run
GROUP BY day
ORDER BY day
""",
)
def concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts_us")
    run_u = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = ev.select("user_id", "ts", F.unix_micros("ts").alias("ts_us"))
    flagged = base.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(wu).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(wu)) > _GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = (
        flagged.withColumn("sess", F.sum("new_s").over(run_u))
        .groupBy("user_id", "sess")
        .agg(
            F.date_trunc("day", F.min("ts")).cast("date").alias("day"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
    )
    deltas = sessions.select(
        "day", F.col("start_us").alias("us"), F.lit(1).alias("delta")
    ).unionAll(
        sessions.select(
            "day", F.col("end_us").alias("us"), F.lit(-1).alias("delta")
        )
    )
    wd = Window.partitionBy("day").orderBy("us", "delta")
    run_d = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    swept = deltas.withColumn("live", F.sum("delta").over(run_d))
    return (
        swept.groupBy("day")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_sessions"),
            F.max("live").cast("long").alias("peak_concurrency"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Q: ewma_value_profile — bounded-lookback exponential smoothing (alpha=1/2,
# window 20) per user via a banded equi-join (offset explode), summarized
# per user. 2^-k weights are exact doubles; both engines weight identically.
# --------------------------------------------------------------------------
_EWMA_LOOKBACK = 19  # current row + 19 predecessors


@query(
    "ewma_value_profile",
    oracle=f"""
WITH r AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
), banded AS (
  SELECT a.user_id, a.rn, a.value,
         sum(b.value * power(0.5, a.rn - b.rn)) AS wsum,
         sum(power(0.5, a.rn - b.rn)) AS wtot
  FROM r a
  JOIN UNNEST(generate_series(0, {_EWMA_LOOKBACK})) AS u(k) ON true
  JOIN r b ON b.user_id = a.user_id AND b.rn = a.rn - u.k
  GROUP BY a.user_id, a.rn, a.value
), e AS (
  SELECT user_id, value, wsum / wtot AS ewma FROM banded
)
SELECT user_id,
       count(*) AS n_events,
       round(avg(ewma), 6) AS avg_ewma,
       round(max(abs(value - ewma)), 6) AS max_resid
FROM e
GROUP BY user_id
ORDER BY user_id
""",
)
def ewma_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "value", F.row_number().over(w).alias("rn")
    )
    # offset explode → equi-join on (user, rn-k): exactly (lookback+1)x
    # amplification of the 3-column projection, and Catalyst plans a plain
    # hash join — no per-user quadratic pair space at any cardinality.
    a = r.select(
        "user_id",
        "rn",
        "value",
        F.explode(
            F.sequence(F.lit(0), F.lit(_EWMA_LOOKBACK))
        ).alias("k"),
    ).withColumn("b_rn", F.col("rn") - F.col("k"))
    b = r.select(
        F.col("user_id").alias("user_id_b"),
        F.col("rn").alias("b_rn"),
        F.col("value").alias("b_value"),
    )
    weight = F.pow(F.lit(0.5), F.col("k"))
    banded = (
        a.join(
            b,
            (a.user_id == b.user_id_b) & (a.b_rn == b.b_rn),
        )
        .groupBy("user_id", "rn", "value")
        .agg(
            F.sum(F.col("b_value") * weight).alias("wsum"),
            F.sum(weight).alias("wtot"),
        )
    )
    e = banded.withColumn("ewma", F.col("wsum") / F.col("wtot"))
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("ewma"), 6).alias("avg_ewma"),
            F.round(F.max(F.abs(F.col("value") - F.col("ewma"))), 6).alias(
                "max_resid"
            ),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q: theil_sen_daily_trend — robust per-type trend: the Theil–Sen estimator
# (median of all pairwise slopes) over the daily value totals. Robust to
# ~29% outliers where the OLS faces (regression_full_per_group) are not.
# Daily totals are rounded BEFORE the pair join so every slope is computed
# from identical doubles in both engines; pair space is bounded by the
# day-grid (O(d²) per type with d = #days, never row-scaled). At corpus
# scale the same shape runs on the pre-aggregated day table, and d² stays
# trivial (a year = 66k pairs).
# --------------------------------------------------------------------------
@query(
    "theil_sen_daily_trend",
    oracle="""
WITH d AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01',
                   CAST(date_trunc('day', ts) AS DATE)) AS t,
         round(sum(value), 6) AS y
  FROM events GROUP BY 1, 2
), p AS (
  SELECT a.event_type, (b.y - a.y) / (b.t - a.t) AS slope
  FROM d a JOIN d b
    ON a.event_type = b.event_type AND b.t > a.t
)
SELECT event_type,
       count(*) AS n_pairs,
       round(median(slope), 6) AS theil_sen_slope
FROM p
GROUP BY event_type
ORDER BY event_type
""",
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("2024-01-01").cast("date"),
        ).alias("t"),
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    from f1_bigdata_pyspark_spark.utils import materialize

    d = materialize(d)  # read twice (both sides of the pair join)
    a = d.select("event_type", F.col("t").alias("ta"), F.col("y").alias("ya"))
    b = d.select("event_type", F.col("t").alias("tb"), F.col("y").alias("yb"))
    p = (
        a.join(b, "event_type")
        .filter(F.col("tb") > F.col("ta"))
        .select(
            "event_type",
            ((F.col("yb") - F.col("ya")) / (F.col("tb") - F.col("ta"))).alias(
                "slope"
            ),
        )
    )
    return (
        p.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.percentile("slope", F.lit(0.5)), 6).alias(
                "theil_sen_slope"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: event_markov_stationary — stationary behaviour profile: row-normalized
# transition matrix over consecutive event types per user (lag-1 bigrams),
# then 3 unrolled power-iteration rounds from the uniform distribution —
# the Markov-chain twin of the PageRank unrolling (PageRank IS this with
# teleport; here the raw chain, no damping). Transition probabilities are
# exact rationals (count/count); iteration sums span at most #types terms.
# Scale: the transition matrix is (types x types) — tiny forever; the only
# corpus-scale work is the one lag window per user partition.
# --------------------------------------------------------------------------
@query(
    "event_markov_stationary",
    oracle="""
WITH t AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), cnt AS (
  SELECT prev AS a, event_type AS b, count(*) AS n
  FROM t WHERE prev IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT a, sum(n) AS tn FROM cnt GROUP BY a
), pm AS (
  SELECT cnt.a, cnt.b, CAST(cnt.n AS DOUBLE) / tot.tn AS pr
  FROM cnt JOIN tot USING (a)
), k AS (SELECT count(DISTINCT a) AS k FROM cnt),
p0 AS (SELECT a AS node, CAST(1 AS DOUBLE) / (SELECT k FROM k) AS p
       FROM (SELECT DISTINCT a FROM cnt)),
p1 AS (SELECT pm.b AS node, sum(p0.p * pm.pr) AS p
       FROM pm JOIN p0 ON p0.node = pm.a GROUP BY pm.b),
p2 AS (SELECT pm.b AS node, sum(p1.p * pm.pr) AS p
       FROM pm JOIN p1 ON p1.node = pm.a GROUP BY pm.b),
p3 AS (SELECT pm.b AS node, sum(p2.p * pm.pr) AS p
       FROM pm JOIN p2 ON p2.node = pm.a GROUP BY pm.b)
SELECT node AS event_type, round(p, 6) AS stationary_p
FROM p3 ORDER BY event_type
""",
)
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small
    from f1_bigdata_pyspark_spark.utils import materialize

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    cnt = t.groupBy(
        F.col("prev").alias("a"), F.col("event_type").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("a").agg(F.sum("n").alias("tn"))
    pm = materialize(  # the (types x types) matrix — read once per round
        cnt.join(broadcast_if_small(tot), "a").select(
            "a", "b", (F.col("n").cast("double") / F.col("tn")).alias("pr")
        )
    )
    k = pm.select("a").distinct().count()  # driver scalar, like PageRank's n
    p = pm.select("a").distinct().select(
        F.col("a").alias("node"), F.lit(1.0 / k).alias("p")
    )
    for _ in range(3):
        p = (
            pm.join(broadcast_if_small(p), pm.a == F.col("node"))
            .groupBy("b")
            .agg(F.sum(F.col("p") * F.col("pr")).alias("p"))
            .select(F.col("b").alias("node"), "p")
        )
    return p.select(
        F.col("node").alias("event_type"), F.round("p", 6).alias("stationary_p")
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q: seasonal_naive_mase — forecast-accuracy readout: the seasonal-naive
# forecast (y_hat(d) = y(d-7) on the observed day grid) scored by MASE
# (mean absolute error scaled by the naive lag-1 error — the
# scale-free accuracy metric of the M-competitions). Both lags are plain
# windows over the per-type day grid; daily totals are rounded before
# differencing so both engines difference identical doubles.
# --------------------------------------------------------------------------
@query(
    "seasonal_naive_mase",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         round(sum(value), 6) AS y
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type, y,
         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7,
         lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1
  FROM d
), e AS (
  SELECT event_type, abs(y - y7) AS e7, abs(y - y1) AS e1
  FROM l WHERE y7 IS NOT NULL
)
SELECT event_type,
       count(*) AS n_days,
       round(avg(e7), 6) AS mae_seasonal,
       round(avg(e1), 6) AS mae_naive,
       round(avg(e7) / avg(e1), 6) AS mase
FROM e GROUP BY event_type ORDER BY event_type
""",
)
def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "y",
        F.lag("y", 7).over(w).alias("y7"),
        F.lag("y", 1).over(w).alias("y1"),
    )
    e = l.filter(F.col("y7").isNotNull()).select(
        "event_type",
        F.abs(F.col("y") - F.col("y7")).alias("e7"),
        F.abs(F.col("y") - F.col("y1")).alias("e1"),
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg("e7"), 6).alias("mae_seasonal"),
            F.round(F.avg("e1"), 6).alias("mae_naive"),
            F.round(F.avg("e7") / F.avg("e1"), 6).alias("mase"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: mahalanobis_outliers — multivariate outlier detection per event type
# over the (value, inter-event gap) plane: 2x2 covariance from one
# sufficient-statistics pass, closed-form inverse, Mahalanobis distance
# d² = (x-μ)ᵀ Σ⁻¹ (x-μ), flag d² > 13.816 (χ²₂ 99.9%). The determinism
# discipline: means/covariances are ROUNDED before the distance pass (the
# same two-pass quantization as CUSUM), so every per-row d² is the same
# arithmetic over the same doubles in both engines. Scale: two
# type-keyed passes (moments, then distances) — the second is a narrow
# map after a broadcast-policied join of the 5-number moment table.
# --------------------------------------------------------------------------
@query(
    "mahalanobis_outliers",
    oracle="""
WITH g AS (
  SELECT event_type, value,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
  FROM events
), x AS (
  SELECT event_type, value AS v, gap_us / 1000000.0 AS gp
  FROM g WHERE gap_us IS NOT NULL
), m AS (
  SELECT event_type,
         round(avg(v), 6) AS mv, round(avg(gp), 6) AS mg,
         round(covar_pop(v, v), 6) AS svv,
         round(covar_pop(v, gp), 6) AS svg,
         round(covar_pop(gp, gp), 6) AS sgg
  FROM x GROUP BY event_type
), d AS (
  SELECT x.event_type,
         ((x.v - m.mv) * (x.v - m.mv) * m.sgg
          - 2 * (x.v - m.mv) * (x.gp - m.mg) * m.svg
          + (x.gp - m.mg) * (x.gp - m.mg) * m.svv)
         / (m.svv * m.sgg - m.svg * m.svg) AS d2
  FROM x JOIN m USING (event_type)
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN d2 > 13.816 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       round(max(d2), 6) AS max_d2
FROM d GROUP BY event_type ORDER BY event_type
""",
)
def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        "value",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    x = g.select(
        "event_type",
        F.col("value").alias("v"),
        (F.col("gap_us") / 1000000.0).alias("gp"),
    )
    m = x.groupBy("event_type").agg(
        F.round(F.avg("v"), 6).alias("mv"),
        F.round(F.avg("gp"), 6).alias("mg"),
        F.round(F.covar_pop("v", "v"), 6).alias("svv"),
        F.round(F.covar_pop("v", "gp"), 6).alias("svg"),
        F.round(F.covar_pop("gp", "gp"), 6).alias("sgg"),
    )
    dv = F.col("v") - F.col("mv")
    dg = F.col("gp") - F.col("mg")
    d2 = (
        dv * dv * F.col("sgg") - 2 * dv * dg * F.col("svg")
        + dg * dg * F.col("svv")
    ) / (F.col("svv") * F.col("sgg") - F.col("svg") * F.col("svg"))
    d = x.join(broadcast_if_small(m), "event_type").select(
        "event_type", d2.alias("d2")
    )
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("d2") > 13.816, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.round(F.max("d2"), 6).alias("max_d2"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q: spearman_value_gap_corr — Spearman rank correlation between an
# event's value and the inter-event gap, per type: Pearson on RANKS,
# computed from integer sufficient sums (Σx, Σy, Σxy, Σx², Σy², n over
# rank integers — every partial sum is exact in any order, so the only
# floats are the final closed-form division). Average ranks for ties are
# avoided by construction: rank ties broken by event_id, making this the
# "rank transform + exact Pearson" variant — documented choice, identical
# in both engines. Scale: two windows + one map-side-combined aggregate
# per type. Int64 headroom: n·Σrx² ≈ n⁴/3 stays under 2^63 for group
# sizes to ~70k; beyond that the closed form folds the sums as doubles
# (statistically immaterial at that n — the exactness is a small-n
# cross-engine guarantee, not a correctness requirement).
# --------------------------------------------------------------------------
@query(
    "spearman_value_gap_corr",
    oracle="""
WITH g AS (
  SELECT event_type, event_id, value,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
  FROM events
), x AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rx,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY gap_us, event_id) AS ry
  FROM g WHERE gap_us IS NOT NULL
), s AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         CAST(sum(rx * ry) AS BIGINT) AS sxy,
         CAST(sum(rx * rx) AS BIGINT) AS sxx,
         CAST(sum(ry * ry) AS BIGINT) AS syy
  FROM x GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
         AS spearman_rho
FROM s ORDER BY event_type
""",
)
def spearman_value_gap_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        "event_id",
        "value",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wx = Window.partitionBy("event_type").orderBy("value", "event_id")
    wy = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    x = g.select(
        "event_type",
        F.row_number().over(wx).cast("long").alias("rx"),
        F.row_number().over(wy).cast("long").alias("ry"),
    )
    s = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(num / (F.sqrt(denx) * F.sqrt(deny)), 6).alias("spearman_rho"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q: kaplan_meier_survival — survival analysis with right-censoring: time
# from each user's FIRST event to their first 'purchase' (users who never
# purchase are censored at their last observed event). The KM estimator
# S(t) = Π_{t_i<=t} (1 - d_i/n_i) is folded relationally: per distinct
# day, deaths + departures; the at-risk count is N minus an integer
# prefix sum (exact in any order); the product becomes exp(Σ ln(...))
# over the ≤ #distinct-days factor table. Survival read out at 3 fixed
# horizons via a 3-row literal join. Scale: two user-keyed aggregates,
# then day-grid-sized arithmetic — the classic churn readout at any
# corpus size.
# --------------------------------------------------------------------------
@query(
    "kaplan_meier_survival",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         min(epoch_us(ts)) AS t0,
         max(epoch_us(ts)) AS tlast,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
  FROM events GROUP BY user_id
), subj AS (
  SELECT user_id,
         CASE WHEN tp IS NOT NULL
              THEN (tp - t0) // 86400000000
              ELSE (tlast - t0) // 86400000000 END AS day,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM per_user
), n AS (SELECT count(*) AS n FROM subj),
per_day AS (
  SELECT day, CAST(sum(ev) AS BIGINT) AS deaths,
         count(*) AS leaving
  FROM subj GROUP BY day
), risk AS (
  SELECT day, deaths,
         (SELECT n FROM n)
         - CAST(coalesce(sum(leaving) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS at_risk
  FROM per_day
), factors AS (
  SELECT day, ln(1 - CAST(deaths AS DOUBLE) / at_risk) AS lf
  FROM risk WHERE deaths > 0 AND at_risk > deaths
), h AS (SELECT unnest([3, 7, 14]) AS horizon)
SELECT h.horizon,
       CAST((SELECT n FROM n) AS BIGINT) AS n_users,
       round(exp(coalesce(sum(f.lf), 0)), 6) AS survival
FROM h LEFT JOIN factors f ON f.day <= h.horizon
GROUP BY h.horizon
ORDER BY h.horizon
""",
)
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.join_policy import local_dim

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.max(us).alias("tlast"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tp"),
    )
    day_of = lambda c: F.floor(c / F.lit(86400000000)).cast("long")  # noqa: E731
    subj = per_user.select(
        F.when(
            F.col("tp").isNotNull(), day_of(F.col("tp") - F.col("t0"))
        )
        .otherwise(day_of(F.col("tlast") - F.col("t0")))
        .alias("day"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    from f1_bigdata_pyspark_spark.utils import materialize

    per_day = materialize(
        subj.groupBy("day").agg(
            F.sum("ev").cast("long").alias("deaths"),
            F.count(F.lit(1)).alias("leaving"),
        )
    )
    n = subj.count()  # driver scalar: the cohort size
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = per_day.select(
        "day",
        "deaths",
        (
            F.lit(n)
            - F.coalesce(F.sum("leaving").over(w), F.lit(0)).cast("long")
        ).alias("at_risk"),
    )
    factors = risk.filter(
        (F.col("deaths") > 0) & (F.col("at_risk") > F.col("deaths"))
    ).select(
        "day",
        F.log(
            1 - F.col("deaths").cast("double") / F.col("at_risk")
        ).alias("lf"),
    )
    horizons = local_dim(spark, [(3,), (7,), (14,)], "horizon long")
    return (
        horizons.join(factors, factors.day <= horizons.horizon, "left")
        .groupBy("horizon")
        .agg(
            F.lit(n).cast("long").alias("n_users"),
            F.round(
                F.exp(F.coalesce(F.sum("lf"), F.lit(0.0))), 6
            ).alias("survival"),
        )
        .orderBy("horizon")
    )


# --------------------------------------------------------------------------
# Q: cumulative_unique_users — distinct-users-to-date growth curve WITHOUT
# a distinct per day: each user contributes on their FIRST-SEEN day only
# (one user-keyed aggregate), then an integer prefix sum over the day
# grid accumulates the curve — exact in any order, and the per-day
# distinct scan a naive rollup would do disappears. The classic DAU/
# cumulative-reach decomposition at corpus scale.
# --------------------------------------------------------------------------
@query(
    "cumulative_unique_users",
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS day
  FROM events GROUP BY user_id
), per_day AS (
  SELECT day, count(*) AS new_users FROM first_seen GROUP BY day
)
SELECT day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
FROM per_day
ORDER BY day
""",
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.utils import materialize

    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("day")
    )
    per_day = materialize(
        first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Q: value_type_mutual_information — feature relevance by mutual
# information: MI(type; value-decile) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))
# over the (event_type × global value decile) contingency table. Deciles
# come from exact global percentiles (rounded split points); every cell
# is an integer count, so the only floats are ~50 per-cell log terms —
# deterministic after the final round. MI==0 iff independent; emitted
# with the table size for the reader. Scale: one ntile-free bucket
# assign (broadcast split points) + one contingency aggregate.
# --------------------------------------------------------------------------
@query(
    "value_type_mutual_information",
    oracle="""
WITH qs AS (
  SELECT list_transform(
           quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
           x -> round(x, 6)) AS q
  FROM events
), b AS (
  SELECT event_type,
         1 + CAST(q[1] <= value AS INT) + CAST(q[2] <= value AS INT)
           + CAST(q[3] <= value AS INT) + CAST(q[4] <= value AS INT)
           + CAST(q[5] <= value AS INT) + CAST(q[6] <= value AS INT)
           + CAST(q[7] <= value AS INT) + CAST(q[8] <= value AS INT)
           + CAST(q[9] <= value AS INT) AS decile
  FROM events, qs
), cell AS (
  SELECT event_type, decile, count(*) AS nxy FROM b GROUP BY 1, 2
), mx AS (SELECT event_type, sum(nxy) AS nx FROM cell GROUP BY 1),
my AS (SELECT decile, sum(nxy) AS ny FROM cell GROUP BY 1),
n AS (SELECT sum(nxy) AS n FROM cell)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_cells,
       round(sum((CAST(nxy AS DOUBLE) / (SELECT n FROM n))
                 * ln(CAST(nxy AS DOUBLE) * (SELECT n FROM n)
                      / (CAST(nx AS DOUBLE) * ny))), 6) AS mutual_info
FROM cell JOIN mx USING (event_type) JOIN my USING (decile)
""",
)
def value_type_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small
    from f1_bigdata_pyspark_spark.utils import materialize

    ev = load_table(spark, sf_dir, "events")
    probs = [i / 10.0 for i in range(1, 10)]
    qs = [
        round(q, 6)
        for q in ev.agg(
            F.percentile("value", F.array(*[F.lit(p) for p in probs]))
        ).head()[0]
    ]
    decile = F.lit(1)
    for q in qs:
        decile = decile + (F.lit(q) <= F.col("value")).cast("int")
    cell = materialize(
        ev.select("event_type", decile.alias("decile"))
        .groupBy("event_type", "decile")
        .agg(F.count(F.lit(1)).alias("nxy"))
    )
    mx = cell.groupBy("event_type").agg(F.sum("nxy").alias("nx"))
    my = cell.groupBy("decile").agg(F.sum("nxy").alias("ny"))
    n = cell.agg(F.sum("nxy")).head()[0]
    joined = cell.join(broadcast_if_small(mx), "event_type").join(
        broadcast_if_small(my), "decile"
    )
    term = (F.col("nxy").cast("double") / F.lit(float(n))) * F.log(
        F.col("nxy").cast("double")
        * F.lit(float(n))
        / (F.col("nx").cast("double") * F.col("ny"))
    )
    return joined.agg(
        F.lit(n).cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum(term), 6).alias("mutual_info"),
    )


# --------------------------------------------------------------------------
# Q: daily_value_acf — autocorrelation function of the daily mean value
# series at calendar lags 1..7 (the seasonality detector that decides
# whether the weekly term in seasonal_decomposition is real): ACF(k) =
# Σ_d c_d·c_{d+k} / Σ_d c_d², with c_d the centered quantized day mean.
# Determinism ladder: per-day sums run over 1e-6-quantized BIGINT values
# (exact in any order); the day mean quantizes to 1e-5 (mq = round(svq /
# (n·10)) — one fixed-order double op on exact ints); centering subtracts
# the integer-floor grand mean; every product/sum after that is exact
# INT64 (|c| ≤ 5.6e7 at value ≤ 560 ⇒ c² ≤ 3.2e15, ×366 days ≈ 1.2e18,
# inside int64 — at unbounded value domains the quantum drops a decade).
# Scale: the corpus collapses to the day grid in one map-side-combinable
# groupBy; the lag self-join and readout run on ≤366 rows/year — no
# window at all (centering arrives as a 1-row broadcast scalar).
# --------------------------------------------------------------------------
@query(
    "daily_value_acf",
    oracle="""
WITH days AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS svq
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
mq AS (
  SELECT d, CAST(round(svq * 1.0 / (n * 10.0)) AS BIGINT) AS mq FROM days
),
center AS (
  SELECT CAST(sum(mq) // count(*) AS BIGINT) AS xbarq,
         CAST(count(*) AS BIGINT) AS n_days
  FROM mq
),
c AS (
  SELECT d, mq - xbarq AS c, n_days FROM mq CROSS JOIN center
),
den AS (SELECT CAST(sum(c * c) AS BIGINT) AS ss FROM c),
lags AS (SELECT unnest(range(1, 8)) AS lag),
pairs AS (
  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(a.c * b.c) AS BIGINT) AS num
  FROM c a JOIN lags l ON TRUE
  JOIN c b ON b.d = a.d + CAST(l.lag AS INTEGER)
  GROUP BY l.lag
)
SELECT lag, n_pairs, round(num * 1.0 / ss, 6) AS acf
FROM pairs CROSS JOIN den
ORDER BY lag
""",
)
def daily_value_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    from f1_bigdata_pyspark_spark.utils import materialize

    # the ≤366-row day grid feeds center + den + both lag-join sides: pin
    # it once so consumers read the tiny table, not the corpus rollup
    mq = materialize(
        days.select(
            "d",
            F.round(F.col("svq") * 1.0 / (F.col("n") * 10.0))
            .cast("long")
            .alias("mq"),
        )
    )
    center = mq.agg(
        F.floor(F.sum("mq") / F.count(F.lit(1))).cast("long").alias("xbarq")
    )
    c = mq.join(F.broadcast(center)).select(  # 1-row scalar
        "d", (F.col("mq") - F.col("xbarq")).alias("c")
    )
    den = c.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = c.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = c.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    pairs = (
        a.join(F.broadcast(lags))  # ≤366×7 rows — bounded grid
        .join(b, F.expr("db = date_add(da, lag)"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("num"),
        )
    )
    return (
        pairs.join(F.broadcast(den))  # 1-row scalar
        .select(
            "lag",
            "n_pairs",
            F.round(F.col("num") * 1.0 / F.col("ss"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


# --------------------------------------------------------------------------
# Q: click_purchase_ccf — lead-lag cross-correlation between the daily
# click series and the daily purchase-value series at calendar lags −3..+3
# (does click volume LEAD purchase value, and by how many days? — the
# marketing-mix lag estimator). Same exact-integer ladder as
# daily_value_acf: both day series quantize to BIGINTs, centering uses
# integer-floor means, and CCF(k) = Σ cx_d·cy_{d+k} / sqrt(Σcx²·Σcy²)
# reads out fixed-order from exact integer sums (cross-products ≤ 3e15 at
# the stated quanta — int64-safe over a full year grid). Negative lags
# come from the same join with the shift applied to the other side.
# Scale: two map-side-combinable day rollups; everything after runs on
# the ≤366-row grid with 1-row scalar broadcasts.
# --------------------------------------------------------------------------
@query(
    "click_purchase_ccf",
    oracle="""
WITH clicks AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
purch AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS pvq
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL GROUP BY 1
),
grid AS (
  SELECT COALESCE(c.d, p.d) AS d,
         CAST(COALESCE(n_clicks, 0) AS BIGINT) AS x,
         CAST(COALESCE(pvq, 0) AS BIGINT) AS y
  FROM clicks c FULL OUTER JOIN purch p ON c.d = p.d
),
center AS (
  SELECT CAST(sum(x) // count(*) AS BIGINT) AS xb,
         CAST(sum(y) // count(*) AS BIGINT) AS yb
  FROM grid
),
c AS (SELECT d, x - xb AS cx, y - yb AS cy FROM grid CROSS JOIN center),
den AS (
  SELECT CAST(sum(cx * cx) AS BIGINT) AS sxx,
         CAST(sum(cy * cy) AS BIGINT) AS syy
  FROM c
),
lags AS (SELECT unnest(range(-3, 4)) AS lag),
pairs AS (
  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(a.cx * b.cy) AS BIGINT) AS num
  FROM c a JOIN lags l ON TRUE
  JOIN c b ON b.d = a.d + CAST(l.lag AS INTEGER)
  GROUP BY l.lag
)
SELECT lag, n_pairs,
       round(num * 1.0 / sqrt(sxx * 1.0 * syy), 6) AS ccf
FROM pairs CROSS JOIN den
ORDER BY lag
""",
)
def click_purchase_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    purch = (
        events.filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 10000).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    from f1_bigdata_pyspark_spark.utils import materialize

    # the ≤366-row grid feeds center + den + both lag-join sides: pin it
    # once (localCheckpoint) so each consumer reads the tiny table instead
    # of replanning the two corpus rollups per read
    grid = materialize(
        clicks.join(purch, "d", "full_outer")
        .select(
            "d",
            F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
    )
    center = grid.agg(
        F.floor(F.sum("x") / F.count(F.lit(1))).cast("long").alias("xb"),
        F.floor(F.sum("y") / F.count(F.lit(1))).cast("long").alias("yb"),
    )
    c = grid.join(F.broadcast(center)).select(  # 1-row scalar
        "d",
        (F.col("x") - F.col("xb")).alias("cx"),
        (F.col("y") - F.col("yb")).alias("cy"),
    )
    den = c.agg(
        F.sum(F.col("cx") * F.col("cx")).cast("long").alias("sxx"),
        F.sum(F.col("cy") * F.col("cy")).cast("long").alias("syy"),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    a = c.select(F.col("d").alias("da"), "cx")
    b = c.select(F.col("d").alias("db"), "cy")
    pairs = (
        a.join(F.broadcast(lags))  # ≤366×7 grid — bounded
        .join(b, F.expr("db = date_add(da, lag)"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("cx") * F.col("cy")).cast("long").alias("num"),
        )
    )
    return (
        pairs.join(F.broadcast(den))  # 1-row scalar
        .select(
            "lag",
            "n_pairs",
            F.round(
                F.col("num") * 1.0
                / F.sqrt(F.col("sxx") * 1.0 * F.col("syy")),
                6,
            ).alias("ccf"),
        )
        .orderBy("lag")
    )


# --------------------------------------------------------------------------
# Q: event_type_fano_burstiness — overdispersion screen per event type:
# the Fano factor (variance-to-mean ratio) of DAILY event counts. A
# Poisson-arriving type sits at 1; campaign bursts and bot storms push it
# far above — the one-number triage next to the CUSUM/EWMA faces.
# Determinism: daily counts are exact BIGINTs; per-type Σn and Σn² are
# integer sufficient sums (counts ≤ 1e12/day would need DECIMAL; fine to
# ~3e9/day in int64); mean/variance/Fano are fixed-order readouts over
# those integers (population variance — the descriptive convention).
# Scale: one (type, day) rollup (map-side combinable), then a
# type-vocabulary-sized aggregate. No windows, no joins.
# --------------------------------------------------------------------------
@query(
    "event_type_fano_burstiness",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(n) AS BIGINT) AS sn,
         CAST(sum(n * n) AS BIGINT) AS snn
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days, sn AS total_events,
       round(sn * 1.0 / n_days, 6) AS mean_daily,
       round((snn * 1.0 / n_days) - (sn * 1.0 / n_days) * (sn * 1.0 / n_days),
             6) AS var_daily,
       round(((snn * 1.0 / n_days)
              - (sn * 1.0 / n_days) * (sn * 1.0 / n_days))
             / (sn * 1.0 / n_days), 6) AS fano
FROM s
ORDER BY event_type
""",
)
def event_type_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("snn"),
    )
    mean = F.col("sn") * 1.0 / F.col("n_days")
    var = (F.col("snn") * 1.0 / F.col("n_days")) - mean * mean
    return s.select(
        "event_type",
        "n_days",
        F.col("sn").alias("total_events"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(var / mean, 6).alias("fano"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q: value_moments_profile — distribution-shape profile per event type:
# mean, population variance, skewness, and EXCESS kurtosis from one pass
# of raw power sums. The determinism ladder gets a new rung here: 4th
# powers of 1e-1-quantized values fit int64 PER ROW (vq ≤ 5.6e4 → vq⁴ ≤
# 9.9e18·1e-4… vq⁴ ≤ 9.8e14), but their SUM does not — so the per-row
# int64 power is accumulated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB
# sum(BIGINT)), both exact and order-independent at any row count up to
# ~1e23. All four moments then read out fixed-order from the exact sums
# (m2 = S2/n − μ², m3, m4 via the raw-to-central identities). Scale: one
# narrow map + one type-keyed aggregate, map-side combinable — the
# ANALYZE-grade profile column stores publish.
# --------------------------------------------------------------------------
@query(
    "value_moments_profile",
    oracle="""
WITH q AS (
  SELECT event_type, CAST(round(value * 10) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(vq) AS DOUBLE) AS s1,
         CAST(sum(vq * vq) AS DOUBLE) AS s2,
         CAST(sum(vq * vq * vq) AS DOUBLE) AS s3,
         CAST(sum(vq * vq * vq * vq) AS DOUBLE) AS s4
  FROM q GROUP BY event_type
),
m AS (
  SELECT event_type, n,
         s1 / n AS m1,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)
           AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM s
)
SELECT event_type, n,
       round(m1 / 10.0, 6) AS mean_value,
       round(m2 / 100.0, 6) AS var_pop,
       round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
       round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
FROM m
ORDER BY event_type
""",
)
def value_moments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    vq = F.col("vq")
    # per-row powers are int64-safe; the cross-row accumulation is NOT —
    # sum in decimal(38,0), exact in any order (Spark's decimal sum)
    dec = "decimal(38,0)"
    s = (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type", F.round(F.col("value") * 10).cast("long").alias("vq")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(vq.cast(dec)).cast("double").alias("s1"),
            F.sum((vq * vq).cast(dec)).cast("double").alias("s2"),
            F.sum((vq * vq * vq).cast(dec)).cast("double").alias("s3"),
            F.sum((vq * vq * vq * vq).cast(dec)).cast("double").alias("s4"),
        )
    )
    n = F.col("n")
    m1 = F.col("s1") / n
    m2 = F.col("s2") / n - m1 * m1
    m3 = F.col("s3") / n - 3 * m1 * (F.col("s2") / n) + 2 * m1 * m1 * m1
    m4 = (
        F.col("s4") / n
        - 4 * m1 * (F.col("s3") / n)
        + 6 * m1 * m1 * (F.col("s2") / n)
        - 3 * m1 * m1 * m1 * m1
    )
    return s.select(
        "event_type",
        "n",
        F.round(m1 / 10.0, 6).alias("mean_value"),
        F.round(m2 / 100.0, 6).alias("var_pop"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q: value_anova_event_types — one-way ANOVA: does mean event value differ
# across event types? F = between-group mean square / within-group mean
# square, computed entirely from per-group integer sufficient sums
# (n_g, Σvq, Σvq²) at 1e-3 quanta (vq ≤ 5.6e5 → vq² ≤ 3.2e11, int64 to
# ~2.9e7 rows/group at sf0.1 — DECIMAL territory far beyond, noted). The
# grand mean and both sums of squares are fixed-order readouts; the only
# cross-row accumulations are the exact integer sums. Scale: ONE
# type-keyed aggregate (map-side combinable) + a k-row readout — the
# textbook screening test before pairwise comparisons.
# --------------------------------------------------------------------------
@query(
    "value_anova_event_types",
    oracle="""
WITH q AS (
  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(vq) AS BIGINT) AS s1,
         CAST(sum(vq * vq) AS BIGINT) AS s2
  FROM q GROUP BY event_type
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s1) AS BIGINT) AS t1,
         CAST(sum(s2) AS BIGINT) AS t2,
         CAST(sum(CAST(round((s1 * 1.0 / n) * (s1 * 1.0 / n) * n)
                       AS BIGINT)) AS BIGINT) AS sum_n_mu2
  FROM g
)
SELECT k AS n_groups, nn AS n_obs,
       round((sum_n_mu2 - (t1 * 1.0 / nn) * t1) / (k - 1) / 1000000.0, 6)
         AS between_ms,
       round((t2 - sum_n_mu2) / (nn - k) / 1000000.0, 6) AS within_ms,
       round(((sum_n_mu2 - (t1 * 1.0 / nn) * t1) / (k - 1))
             / ((t2 - sum_n_mu2) / (nn - k)), 6) AS f_stat
FROM tot
""",
)
def value_anova_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    g = (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 1000).cast("long").alias("vq"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vq").cast("long").alias("s1"),
            F.sum(F.col("vq") * F.col("vq")).cast("long").alias("s2"),
        )
    )
    # n·μ_g² quantizes to a BIGINT per group row BEFORE the cross-group
    # sum — a k-term double sum is still order-dependent in principle
    mu_term = F.round(
        (F.col("s1") * 1.0 / F.col("n"))
        * (F.col("s1") * 1.0 / F.col("n"))
        * F.col("n")
    ).cast("long")
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s1").cast("long").alias("t1"),
        F.sum("s2").cast("long").alias("t2"),
        F.sum(mu_term).cast("long").alias("sum_n_mu2"),
    )
    between = (F.col("sum_n_mu2") - (F.col("t1") * 1.0 / F.col("nn")) * F.col("t1")) / (
        F.col("k") - 1
    )
    within = (F.col("t2") - F.col("sum_n_mu2")) / (F.col("nn") - F.col("k"))
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_obs"),
        F.round(between / 1000000.0, 6).alias("between_ms"),
        F.round(within / 1000000.0, 6).alias("within_ms"),
        F.round(between / within, 6).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Q: dow_seasonality_anova — is weekly seasonality statistically real? The
# ACF face shows the lag-7 bump; this one tests it: one-way ANOVA of
# daily event totals grouped by day-of-week (7 groups). Same
# integer-sufficient-sums machinery as value_anova_event_types, but the
# observation unit is the DAY (one corpus rollup to the day grid, then
# everything is grid-sized) — so the two ANOVA faces also demonstrate the
# operator at both ends of the group-size spectrum. Daily totals are
# exact BIGINT counts; n·μ² group terms quantize before the 7-cell fold.
# --------------------------------------------------------------------------
@query(
    "dow_seasonality_anova",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
g AS (
  SELECT isodow(d) AS dow, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n) AS BIGINT) AS s1,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM daily GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s1) AS BIGINT) AS t1,
         CAST(sum(s2) AS BIGINT) AS t2,
         CAST(sum(CAST(round((s1 * 1.0 / n) * (s1 * 1.0 / n) * n)
                       AS BIGINT)) AS BIGINT) AS sum_n_mu2
  FROM g
)
SELECT k AS n_dow_groups, nn AS n_days,
       round((sum_n_mu2 - (t1 * 1.0 / nn) * t1) / (k - 1), 6) AS between_ms,
       round((t2 - sum_n_mu2) / (nn - k), 6) AS within_ms,
       round(((sum_n_mu2 - (t1 * 1.0 / nn) * t1) / (k - 1))
             / ((t2 - sum_n_mu2) * 1.0 / (nn - k)), 6) AS f_stat
FROM tot
""",
)
def dow_seasonality_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    g = daily.groupBy(F.dayofweek("d").alias("raw_dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    mu_term = F.round(
        (F.col("s1") * 1.0 / F.col("n"))
        * (F.col("s1") * 1.0 / F.col("n"))
        * F.col("n")
    ).cast("long")
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s1").cast("long").alias("t1"),
        F.sum("s2").cast("long").alias("t2"),
        F.sum(mu_term).cast("long").alias("sum_n_mu2"),
    )
    between = (
        F.col("sum_n_mu2") - (F.col("t1") * 1.0 / F.col("nn")) * F.col("t1")
    ) / (F.col("k") - 1)
    within = (F.col("t2") - F.col("sum_n_mu2")) / (F.col("nn") - F.col("k"))
    return tot.select(
        F.col("k").alias("n_dow_groups"),
        F.col("nn").alias("n_days"),
        F.round(between, 6).alias("between_ms"),
        F.round(within, 6).alias("within_ms"),
        F.round(between / within, 6).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Q: purchase_interarrival_cv — renewal-process check on purchase timing:
# per-user inter-purchase gaps pooled corpus-wide, mean and coefficient
# of variation. CV ≈ 1 is the Poisson (memoryless) signature; CV < 1
# means pacing/regularity, CV > 1 bursts — the per-event-time companion
# to the daily-count Fano face. Gaps are exact integer microseconds from
# one user-partitioned lag window; Σg and Σg² accumulate in
# DECIMAL(38,0)/HUGEINT (gaps ≤ 2.6e12 µs over a month ⇒ g² ≤ 6.7e24 —
# int64 per-row is ALREADY insufficient, so the per-row square itself is
# computed in decimal — the moments-face ladder extended one rung).
# Scale: one user-keyed window exchange + a global 1-row readout.
# --------------------------------------------------------------------------
@query(
    "purchase_interarrival_cv",
    oracle="""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events WHERE event_type = 'purchase'
),
g AS (
  SELECT CAST(ts_us - prev_us AS BIGINT) AS gap
  FROM p WHERE prev_us IS NOT NULL
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(gap) AS DOUBLE) AS s1,
         CAST(sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS DOUBLE)
           AS s2
  FROM g
)
SELECT n AS n_gaps,
       round(s1 / n / 3600000000.0, 6) AS mean_gap_hours,
       round(sqrt(s2 / n - (s1 / n) * (s1 / n)) / (s1 / n), 6) AS cv
FROM s
""",
)
def purchase_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.unix_micros("ts").alias("ts_us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    gap = (F.col("ts_us") - F.col("prev_us")).cast("long")
    dec = "decimal(38,0)"
    s = p.filter(F.col("prev_us").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(gap.cast(dec)).cast("double").alias("s1"),
        # the SQUARE itself needs decimal — month-scale µs gaps overflow
        # int64 when squared
        F.sum((gap.cast(dec) * gap.cast(dec)).cast(dec))
        .cast("double")
        .alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1") / n
    var = F.col("s2") / n - mean * mean
    return s.select(
        n.alias("n_gaps"),
        F.round(mean / 3600000000.0, 6).alias("mean_gap_hours"),
        F.round(F.sqrt(var) / mean, 6).alias("cv"),
    )


# --------------------------------------------------------------------------
# Q: value_psi_drift — Population Stability Index between the first and
# second half of the observation month (split at Jan 16), over 10 value
# deciles fixed from the FULL-period distribution: PSI = Σ (p−q)·ln(p/q),
# the industry-standard model-input drift gate (<0.1 stable, >0.25 act).
# Complements the KS face (max ECDF gap) with the binned mass-shift view
# scorecards actually monitor. Decile edges come from the bounded
# quantized-value histogram (integer 10·cum ≥ k·N rule — no float
# percentile midpoints); bin shares are exact integer ppm via floor, and
# each PSI term is a fixed-order scalar over those integers quantized to
# 1e-9 before the 10-term fold. Laplace-smoothed counts (+1) keep every
# ln defined. Scale: corpus → value histogram (map-side combinable) →
# everything bounded; the period split reuses the same single scan.
# --------------------------------------------------------------------------
@query(
    "value_psi_drift",
    oracle="""
WITH q AS (
  SELECT CAST(round(value * 1000) AS BIGINT) AS vq,
         CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END
           AS half
  FROM events WHERE value IS NOT NULL
),
hist AS (
  SELECT vq, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY vq
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM hist),
cum AS (
  SELECT vq, CAST(sum(n) OVER (ORDER BY vq ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS c
  FROM hist
),
edges AS (
  SELECT k, min(vq) AS edge FROM cum
  CROSS JOIN (SELECT unnest(range(1, 10)) AS k)
  WHERE 10 * c >= k * (SELECT nn FROM tot)
  GROUP BY k
),
binned AS (
  SELECT half,
         1 + (SELECT count(*) FROM edges e WHERE e.edge < q.vq) AS bin
  FROM q
),
cells AS (
  SELECT bin,
         CAST(1 + count_if(half = 0) AS BIGINT) AS n0,
         CAST(1 + count_if(half = 1) AS BIGINT) AS n1
  FROM binned GROUP BY bin
),
tots AS (
  SELECT CAST(sum(n0) AS BIGINT) AS t0, CAST(sum(n1) AS BIGINT) AS t1
  FROM cells
),
terms AS (
  SELECT bin,
         CAST(round((n0 * 1.0 / t0 - n1 * 1.0 / t1)
                    * ln((n0 * 1.0 / t0) / (n1 * 1.0 / t1)) * 1e9)
              AS BIGINT) AS tq
  FROM cells CROSS JOIN tots
)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       round(sum(tq) / 1e9, 6) AS psi
FROM terms
""",
)
def value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.utils import materialize

    events = load_table(spark, sf_dir, "events")
    q = materialize(
        events.filter(F.col("value").isNotNull()).select(
            F.round(F.col("value") * 1000).cast("long").alias("vq"),
            F.when(
                F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 0
            )
            .otherwise(1)
            .alias("half"),
        )
    )
    hist = q.groupBy("vq").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wcum = Window.orderBy("vq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select("vq", F.sum("n").over(wcum).cast("long").alias("c"))
    nn = q.count()  # driver scalar: the decile denominator
    ks = F.array(*[F.lit(k) for k in range(1, 10)])
    edges_df = (
        cum.select("vq", "c", F.explode(ks).alias("k"))
        .filter(10 * F.col("c") >= F.col("k") * F.lit(nn))
        .groupBy("k")
        .agg(F.min("vq").alias("edge"))
    )
    edges = sorted(r["edge"] for r in edges_df.collect())  # 9 literals
    bin_expr = F.lit(1)
    for e in edges:
        bin_expr = bin_expr + F.when(F.lit(e) < F.col("vq"), 1).otherwise(0)
    cells = q.groupBy(bin_expr.alias("bin")).agg(
        (F.count_if(F.col("half") == 0) + 1).cast("long").alias("n0"),
        (F.count_if(F.col("half") == 1) + 1).cast("long").alias("n1"),
    )
    tots = cells.agg(
        F.sum("n0").cast("long").alias("t0"),
        F.sum("n1").cast("long").alias("t1"),
    )
    p = F.col("n0") * 1.0 / F.col("t0")
    qq = F.col("n1") * 1.0 / F.col("t1")
    return (
        cells.join(F.broadcast(tots))  # 1-row scalar
        .select(F.round((p - qq) * F.log(p / qq) * 1e9).cast("long").alias("tq"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.round(F.sum("tq") / 1e9, 6).alias("psi"),
        )
    )
