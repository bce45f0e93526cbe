"""Reference-domain semantics tests on an inline laps-shaped fixture.

The driver's synthetic tables don't contain the reference's null-vs-NaN
duality or var==0 stints, so these tests build a tiny laps table inline
(FIXTURES.md §1 shape) and assert the exact semantics of the reference's
analytics:

- NULL and NaN are distinct missing states, both filtered
  (fastest_vs_most_consistent_drivers.py:64; tyre_degradation_by_stint.py:40-43)
- stddev_pop (not sample) is the consistency metric (fastest_...py:102)
- the sufficient-statistics slope equals Spark's regr_slope, and var==0
  yields NULL, not an error (tyre_degradation_by_stint.py:54-79)
- two-level aggregation weights each race equally (ipynb cell 9)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.functions.stats import (
    slope_from_stats,
    slope_sufficient_stats,
    stddev_pop,
)

NAN = float("nan")

LAPS = [
    # (Driver, GrandPrix, LapNumber, Stint, TyreLife, LapTime, PitInTime)
    # VER, race A: clean stint, lap time rises 80+0.5*tyrelife exactly
    ("VER", "A", 1.0, 1.0, 1.0, 80.5, None),
    ("VER", "A", 2.0, 1.0, 2.0, 81.0, None),
    ("VER", "A", 3.0, 1.0, 3.0, 81.5, None),
    ("VER", "A", 4.0, 1.0, 4.0, 82.0, None),
    # VER race A stint 2: constant TyreLife after filter -> var==0 -> NULL
    ("VER", "A", 5.0, 2.0, 2.0, 84.0, None),
    ("VER", "A", 6.0, 2.0, 2.0, 85.0, None),
    # VER, race B
    ("VER", "B", 1.0, 1.0, 1.0, 90.0, None),
    ("VER", "B", 2.0, 1.0, 2.0, 91.0, None),
    # HAM: one NULL laptime, one NaN laptime, one pit lap, two clean
    ("HAM", "A", 1.0, 1.0, 1.0, None, None),
    ("HAM", "A", 2.0, 1.0, 2.0, NAN, None),
    ("HAM", "A", 3.0, 1.0, 3.0, 88.0, 100.0),  # pit lap
    ("HAM", "A", 4.0, 1.0, 4.0, 86.0, None),
    ("HAM", "A", 5.0, 1.0, 5.0, 90.0, None),
]

COLS = ["Driver", "GrandPrix", "LapNumber", "Stint", "TyreLife", "LapTime", "PitInTime"]
SCHEMA = (
    "Driver string, GrandPrix string, LapNumber double, Stint double, "
    "TyreLife double, LapTime double, PitInTime double"
)


@pytest.fixture(scope="module")
def laps(spark):
    return spark.createDataFrame(LAPS, SCHEMA)


def clean(df):
    """The reference's clean-lap predicate stack: LapTime present (both
    missing flavors), not a pit lap."""
    lt = F.col("LapTime")
    no_pit = F.col("PitInTime").isNull() | F.isnan(F.col("PitInTime"))
    return df.filter(lt.isNotNull() & ~F.isnan(lt) & no_pit)


def test_null_and_nan_both_filtered(laps):
    # NULL-only filter keeps the NaN row; the dual filter drops both
    only_null = laps.filter(F.col("LapTime").isNotNull()).count()
    both = laps.filter(
        F.col("LapTime").isNotNull() & ~F.isnan(F.col("LapTime"))
    ).count()
    assert only_null == 12  # 13 rows - 1 NULL
    assert both == 11  # also drops the NaN


def test_avg_laptime_by_driver(laps):
    # mongo_avg_laptime_by_driver.py:33-41 shape: filter -> groupBy -> avg
    res = {
        r["Driver"]: (r["n_laps"], r["avg_lap_s"])
        for r in clean(laps)
        .groupBy("Driver")
        .agg(F.count(F.lit(1)).alias("n_laps"), F.avg("LapTime").alias("avg_lap_s"))
        .collect()
    }
    assert res["HAM"][0] == 2  # NULL, NaN and pit laps excluded
    assert res["HAM"][1] == pytest.approx(88.0)
    assert res["VER"][0] == 8


def test_stddev_is_population(laps):
    # two HAM clean laps: 86, 90 -> pop std = 2.0, sample std = 2.828
    row = (
        clean(laps)
        .filter(F.col("Driver") == "HAM")
        .agg(
            stddev_pop(F.col("LapTime")).alias("pop"),
            F.stddev_samp("LapTime").alias("samp"),
        )
        .head()
    )
    assert row["pop"] == pytest.approx(2.0)
    assert row["samp"] == pytest.approx(2.0 * math.sqrt(2))


def test_slope_sufficient_stats_and_regr_slope(laps):
    stats = slope_sufficient_stats(F.col("TyreLife"), F.col("LapTime"))
    per_stint = (
        clean(laps)
        .groupBy("Driver", "GrandPrix", "Stint")
        .agg(*stats.values(), F.regr_slope("LapTime", "TyreLife").alias("builtin"))
        .withColumn(
            "slope",
            slope_from_stats(
                F.col("avg_x"), F.col("avg_y"), F.col("avg_xy"), F.col("avg_xx")
            ),
        )
    )
    rows = {
        (r["Driver"], r["GrandPrix"], r["Stint"]): r for r in per_stint.collect()
    }
    # exact linear stint: slope 0.5 s per tyre lap, formula == builtin
    ver_a1 = rows[("VER", "A", 1.0)]
    assert ver_a1["slope"] == pytest.approx(0.5)
    assert ver_a1["builtin"] == pytest.approx(0.5)
    # constant-x stint: guarded division -> NULL (reference tyre_...py:75-78)
    ver_a2 = rows[("VER", "A", 2.0)]
    assert ver_a2["slope"] is None
    assert ver_a2["builtin"] is None


def test_equal_per_race_two_level(laps):
    # ipynb cell 9: per-(Driver, race) avg, then avg-of-avgs per driver
    per_race = (
        clean(laps)
        .groupBy("Driver", "GrandPrix")
        .agg(F.avg("LapTime").alias("avg_race"))
    )
    res = {
        r["Driver"]: (r["races_present"], r["avg_equal"])
        for r in per_race.groupBy("Driver")
        .agg(
            F.count(F.lit(1)).alias("races_present"),
            F.avg("avg_race").alias("avg_equal"),
        )
        .collect()
    }
    # VER race A clean avg = (80.5+81+81.5+82+84+85)/6 = 82.3333, race B = 90.5
    assert res["VER"][0] == 2
    assert res["VER"][1] == pytest.approx((82.33333333333333 + 90.5) / 2)
