"""The reference's flagship lap-analytics pipelines as library functions.

A user of the reference repo runs three processing jobs; each maps to one
function here, taking a laps DataFrame (FIXTURES.md §1 schema) instead of a
Mongo scan. Semantics are reproduced exactly — filter stacks, HAVING
thresholds, population stddev, sufficient-statistics slope with guarded
division — re-expressed as composable functions over any laps source.

Reference parity map:
- ``clean_laps``                reference ``fastest_vs_most_consistent_drivers.py:53-87``
- ``lap_weighted_metrics``      reference ``fastest_vs_most_consistent_drivers.py:90-106``
- ``race_normalized_metrics``   reference ``fastest_vs_most_consistent_drivers.py:109-142``
- ``pareto_table``              reference ``fastest_vs_most_consistent_drivers.py:145-163``
- ``avg_laptime_by_driver``     reference ``mongo_avg_laptime_by_driver.py:33-41``
- ``tyre_degradation_by_stint`` reference ``tyre_degradation_by_stint.py:30-81``
- ``compound_summary``          reference ``f1_project_report.ipynb`` cell 32

Scale notes (100 TB design):
- Every aggregation is keyed (Driver / Driver+GrandPrix / the 6-key stint);
  partial aggregation map-side-combines before the shuffle — these shapes
  hold at any scale.
- The two ``dense_rank`` windows in ``pareto_table`` are unpartitioned BUT
  run over post-aggregation cardinality (one row per driver), per the
  documented rule: rank only after reducing to per-entity aggregates
  (SURVEY.md §7). Never call it on a pre-aggregation table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import has_column
from f1_bigdata_pyspark_spark.functions.stats import stddev_pop


def _missing(c: Column) -> Column:
    """The reference's dual missing test: SQL NULL or float NaN
    (``fastest_...py:72-75``)."""
    return c.isNull() | F.isnan(c)


def clean_laps(df: DataFrame) -> DataFrame:
    """Clean-lap predicate stack, schema-tolerant like the reference: each
    optional filter applies only when its column exists
    (``fastest_vs_most_consistent_drivers.py:53-87``)."""
    lt = F.col("LapTime")
    clean = df.filter(lt.isNotNull() & ~F.isnan(lt))
    if has_column(df, "IsAccurate"):
        clean = clean.filter(F.col("IsAccurate") == True)  # noqa: E712
    if has_column(df, "PitInTime") and has_column(df, "PitOutTime"):
        clean = clean.filter(
            _missing(F.col("PitInTime")) & _missing(F.col("PitOutTime"))
        )
    if has_column(df, "Session"):
        clean = clean.filter(F.col("Session") == F.lit("R"))
    clean = clean.filter(F.col("Driver").isNotNull())
    if has_column(df, "GrandPrix"):
        clean = clean.filter(F.col("GrandPrix").isNotNull())
    return clean


def avg_laptime_by_driver(laps: DataFrame) -> DataFrame:
    """Q1a: lap-weighted average lap time per driver
    (``mongo_avg_laptime_by_driver.py:33-41``: filter → groupBy → count/avg
    → orderBy asc)."""
    lt = F.col("LapTime")
    return (
        laps.filter(lt.isNotNull() & ~F.isnan(lt) & F.col("Driver").isNotNull())
        .groupBy("Driver")
        .agg(
            F.count(F.lit(1)).alias("n_laps"),
            F.avg("LapTime").alias("avg_lap_s"),
        )
        .orderBy(F.col("avg_lap_s").asc())
    )


def lap_weighted_metrics(clean: DataFrame, min_laps: int = 100) -> DataFrame:
    """Q2 view A: lap-weighted speed/consistency metrics with the
    small-sample HAVING guard (``fastest_...py:90-106``)."""
    return (
        clean.groupBy("Driver")
        .agg(
            F.count(F.lit(1)).alias("n_laps"),
            F.avg("LapTime").alias("avg_lap_s"),
            stddev_pop(F.col("LapTime")).alias("std_lap_s"),
        )
        .filter(F.col("n_laps") >= min_laps)
    )


def race_normalized_metrics(
    clean: DataFrame, min_laps_per_race: int = 10, min_races: int = 8
) -> DataFrame:
    """Q2 view B: equal-weight-per-race two-level aggregation
    (``fastest_...py:109-142``): per-(Driver, GrandPrix) mean/std with a
    per-race coverage HAVING, then avg-of-those per driver with a
    races-present HAVING."""
    per_race = (
        clean.groupBy("Driver", "GrandPrix")
        .agg(
            F.count(F.lit(1)).alias("laps_in_race"),
            F.avg("LapTime").alias("race_avg_lap_s"),
            stddev_pop(F.col("LapTime")).alias("race_std_lap_s"),
        )
        .filter(F.col("laps_in_race") >= min_laps_per_race)
    )
    return (
        per_race.groupBy("Driver")
        .agg(
            F.count(F.lit(1)).alias("races_present"),
            F.avg("race_avg_lap_s").alias("avg_lap_s_equal_races"),
            F.avg("race_std_lap_s").alias("std_lap_s_equal_races"),
        )
        .filter(F.col("races_present") >= min_races)
    )


def pareto_table(
    metrics: DataFrame, avg_col: str, std_col: str, top_n: int = 15
) -> DataFrame:
    """Q2 combined view: dense-rank by speed and by consistency, composite
    rank_sum, full tiebreaker sort, top-n (``fastest_...py:145-163``).
    Unpartitioned windows — safe ONLY because the input is one row per
    driver (post-agg); see module docstring."""
    w_speed = Window.orderBy(F.col(avg_col).asc())
    w_cons = Window.orderBy(F.col(std_col).asc())
    return (
        metrics.withColumn("rank_speed", F.dense_rank().over(w_speed))
        .withColumn("rank_consistency", F.dense_rank().over(w_cons))
        .withColumn("rank_sum", F.col("rank_speed") + F.col("rank_consistency"))
        .orderBy(
            F.col("rank_sum").asc(), F.col(avg_col).asc(), F.col(std_col).asc()
        )
        .limit(top_n)
    )


def tyre_degradation_by_stint(df: DataFrame, min_laps: int = 8) -> DataFrame:
    """Q3: per-stint tyre-degradation slope from sufficient statistics
    (``tyre_degradation_by_stint.py:30-81``): 10-filter clean stack → 6-key
    groupBy → avg/avg(xy)/avg(x²) → cov/var → guarded division → ms scale →
    HAVING n_laps ≥ 8 → orderBy slope desc."""
    no_pit = _missing(F.col("PitInTime")) & _missing(F.col("PitOutTime"))
    clean = df.filter(
        F.col("LapTime").isNotNull()
        & ~F.isnan("LapTime")
        & F.col("TyreLife").isNotNull()
        & ~F.isnan("TyreLife")
        & F.col("Stint").isNotNull()
        & F.col("Driver").isNotNull()
        & F.col("GrandPrix").isNotNull()
        & F.col("Compound").isin(["SOFT", "MEDIUM", "HARD"])
        & (F.col("IsAccurate") == True)  # noqa: E712
        & no_pit
        & (F.col("TyreLife") >= 2)
    )
    x = F.col("TyreLife").cast("double")
    y = F.col("LapTime").cast("double")
    agg = clean.groupBy(
        "Year", "GrandPrix", "Session", "Driver", "Stint", "Compound"
    ).agg(
        F.count(F.lit(1)).alias("n_laps"),
        F.avg(x).alias("x_mean"),
        F.avg(y).alias("y_mean"),
        F.avg(x * y).alias("xy_mean"),
        F.avg(x * x).alias("x2_mean"),
        F.min("TyreLife").alias("tyre_life_min"),
        F.max("TyreLife").alias("tyre_life_max"),
    )
    return (
        agg.withColumn("cov_xy", F.col("xy_mean") - F.col("x_mean") * F.col("y_mean"))
        .withColumn("var_x", F.col("x2_mean") - F.col("x_mean") * F.col("x_mean"))
        .withColumn(
            "deg_s_per_tyre_lap",
            F.when(F.col("var_x") == 0, F.lit(None)).otherwise(
                F.col("cov_xy") / F.col("var_x")
            ),
        )
        .withColumn("deg_ms_per_tyre_lap", F.col("deg_s_per_tyre_lap") * F.lit(1000.0))
        .filter(F.col("n_laps") >= min_laps)
        .orderBy(F.col("deg_ms_per_tyre_lap").desc())
    )


def compound_summary(deg: DataFrame) -> DataFrame:
    """Q3 rollup: per-compound count/mean/median of the stint slopes — the
    notebook's post-collect pandas summary (cell 32), kept distributed via
    Spark's exact ``median``."""
    return (
        deg.filter(F.col("deg_ms_per_tyre_lap").isNotNull())
        .groupBy("Compound")
        .agg(
            F.count(F.lit(1)).alias("n_stints"),
            F.avg("deg_ms_per_tyre_lap").alias("mean_deg_ms"),
            F.median("deg_ms_per_tyre_lap").alias("median_deg_ms"),
        )
        .orderBy("Compound")
    )
