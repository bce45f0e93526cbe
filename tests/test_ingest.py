"""Laps-ingest normalization + skew operators."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.operators.skew import (
    salted_agg_counts,
    salted_join_broadcast_hot_keys,
)
from f1_bigdata_pyspark_spark.sources.laps_ingest import (
    LAP_KEY,
    ingest_lap_batch,
    interval_to_seconds,
    nan_to_null,
    normalize_lap_batch,
    timestamp_to_iso,
)

NAN = float("nan")


def test_interval_to_seconds(spark):
    df = spark.sql(
        "SELECT INTERVAL '0 00:01:23.456' DAY TO SECOND AS td"
    )
    assert df.select(interval_to_seconds(F.col("td")).alias("s")).head()["s"] == (
        pytest.approx(83.456)
    )


def test_nan_to_null_and_iso(spark):
    df = spark.createDataFrame(
        [(1.5, datetime.datetime(2023, 5, 28, 13, 0, 0))], "x double, ts timestamp"
    )
    df = df.union(
        spark.createDataFrame(
            [(NAN, datetime.datetime(2023, 5, 28, 14, 30, 5))], "x double, ts timestamp"
        )
    )
    rows = df.select(
        nan_to_null(F.col("x")).alias("x"), timestamp_to_iso(F.col("ts")).alias("iso")
    ).collect()
    assert rows[0]["x"] == 1.5 and rows[0]["iso"] == "2023-05-28T13:00:00Z"
    assert rows[1]["x"] is None  # NaN normalized to NULL


def test_normalize_and_upsert_batch(spark):
    raw = spark.createDataFrame(
        [
            ("VER", "Red Bull", 1.0, 1.0, "SOFT", 1.0, 92.3, True, "1"),
            ("VER", "Red Bull", 2.0, 1.0, "SOFT", 2.0, NAN, True, "1"),
            ("HAM", "Mercedes", 1.0, 1.0, "MEDIUM", 1.0, 93.1, False, "2"),
        ],
        "Driver string, Team string, LapNumber double, Stint double, "
        "Compound string, TyreLife double, LapTime double, IsAccurate boolean, "
        "TrackStatus string",
    )
    b1 = normalize_lap_batch(raw, 2023, "Monaco Grand Prix", "R", "2023-05-28T17:00:00Z")
    merged = ingest_lap_batch(None, b1)
    assert merged.count() == 3
    # NaN got normalized to NULL at ingest
    assert merged.filter(F.col("LapTime").isNull()).count() == 1
    assert set(LAP_KEY) <= set(merged.columns)

    # re-ingest same batch with later timestamp + one corrected lap
    corrected = normalize_lap_batch(
        raw.withColumn(
            "LapTime", F.when(F.col("LapNumber") == 2.0, 91.9).otherwise(F.col("LapTime"))
        ),
        2023,
        "Monaco Grand Prix",
        "R",
        "2023-05-28T18:00:00Z",
    )
    m2 = ingest_lap_batch(merged, corrected)
    assert m2.count() == 3  # still unique on the lap key
    fixed = m2.filter((F.col("Driver") == "VER") & (F.col("LapNumber") == 2.0)).head()
    assert fixed["LapTime"] == pytest.approx(91.9)  # keep-latest won


def test_schema_tolerant_keep_list(spark):
    # missing Sector/Pit columns: the keep-list projection skips them
    raw = spark.createDataFrame(
        [("VER", 1.0, 90.0)], "Driver string, LapNumber double, LapTime double"
    )
    out = normalize_lap_batch(raw, 2023, "X", "R", "t")
    assert "Sector1Time" not in out.columns
    assert out.head()["LapTime"] == 90.0


def test_salted_agg_equals_plain(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    salted = {
        r["l_returnflag"]: (r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
        for r in salted_agg_counts(li, ["l_returnflag"], "l_quantity").collect()
    }
    plain = {
        r["l_returnflag"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("s"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert salted[k][1] == pytest.approx(plain[k][1])
        assert salted[k][2:] == plain[k][2:]


def test_salted_join_equals_plain(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select("l_suppkey", "l_quantity")
    supp = load_table(spark, sf_smoke, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    split = salted_join_broadcast_hot_keys(li, supp, "l_suppkey", hot_keys=[1, 2])
    plain = li.join(supp, "l_suppkey", "inner")
    assert split.count() == plain.count()
    a = {tuple(r) for r in split.collect()}
    b = {tuple(r) for r in plain.collect()}
    assert a == b
