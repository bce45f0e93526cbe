"""Laps-domain ingestion normalization — the reference's ingest layer,
engine-side.

The reference ingests FastF1 pandas frames and hand-normalizes every value
for Mongo (reference: ``src/ingest/ingest_season_laps.py:11-42``
``mongo_safe`` — Timedelta→float seconds, Timestamp→ISO string, numpy→python,
all NaN flavors→None; ``src/ingest/ingest_laps.py:16-22,37-50`` — column
keep-list + constant metadata columns). Here the same semantics are Spark
expressions applied at ingest, composing with the idempotent upsert writer
(``sources/parquet.py``) to reproduce the full S1→S5 pipeline without Mongo.

The FastF1 network source itself cannot run in this environment; its output
contract (a pandas frame with Timedelta lap/sector columns) is represented by
the test fixture — the normalization and upsert layers are the real,
portable engine code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the reference's ingest keep-list (ingest_laps.py:37-42)
LAP_COLUMNS = [
    "Driver",
    "Team",
    "LapNumber",
    "Stint",
    "Compound",
    "TyreLife",
    "LapTime",
    "Sector1Time",
    "Sector2Time",
    "Sector3Time",
    "PitInTime",
    "PitOutTime",
    "IsAccurate",
    "TrackStatus",
]

# logical primary key (create_indexes.py:13-23)
LAP_KEY = ["Year", "GrandPrix", "Session", "Driver", "LapNumber"]


def interval_to_seconds(c: Column) -> Column:
    """Timedelta→float seconds (reference ``to_seconds``,
    ingest_laps.py:16-22). Spark has no interval→double cast (bigint cast
    truncates sub-seconds); anchoring the interval to the epoch and taking
    unix_micros keeps exact micro precision."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    return F.unix_micros(epoch + c).cast("double") / F.lit(1e6)


def nan_to_null(c: Column) -> Column:
    """NaN→NULL normalization (reference mongo_safe NaN handling,
    ingest_season_laps.py:15-28). Applied at ingest so stored data carries
    one canonical missing state; query-side code still guards both
    (SURVEY.md §1.3)."""
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def timestamp_to_iso(c: Column) -> Column:
    """Timestamp→ISO-8601 UTC string (reference mongo_safe,
    ingest_season_laps.py:34-36)."""
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def with_ingest_metadata(
    df: DataFrame, year: int, grand_prix: str, session: str, ingested_at: str
) -> DataFrame:
    """Constant metadata columns per batch (reference ingest_laps.py:47-50)."""
    return (
        df.withColumn("Year", F.lit(year).cast(T.IntegerType()))
        .withColumn("GrandPrix", F.lit(grand_prix))
        .withColumn("Session", F.lit(session))
        .withColumn("IngestedAt", F.lit(ingested_at))
    )


def normalize_lap_batch(
    raw: DataFrame,
    year: int,
    grand_prix: str,
    session: str,
    ingested_at: str,
    seconds_cols: tuple[str, ...] = (
        "LapTime",
        "Sector1Time",
        "Sector2Time",
        "Sector3Time",
        "PitInTime",
        "PitOutTime",
    ),
) -> DataFrame:
    """Full ingest normalization: keep-list projection, interval→seconds,
    NaN→NULL on double columns, metadata append. Schema-tolerant: absent
    keep-list columns are skipped (the reference's `if col in df.columns`
    pattern)."""
    present = [c for c in LAP_COLUMNS if c in raw.columns]
    out = raw.select(*present)
    for c in seconds_cols:
        if c not in out.columns:
            continue
        dtype = dict(out.dtypes)[c]
        col = F.col(c)
        if "interval" in dtype:
            col = interval_to_seconds(col)
        else:
            col = col.cast("double")
        out = out.withColumn(c, nan_to_null(col))
    return with_ingest_metadata(out, year, grand_prix, session, ingested_at)


def ingest_lap_batch(
    existing: DataFrame | None, normalized_batch: DataFrame
) -> DataFrame:
    """Idempotent keep-latest upsert on the lap key (reference S4/S5:
    bulk UpdateOne upserts + unique index)."""
    from f1_bigdata_pyspark_spark.sources.parquet import (
        assert_unique_key,
        upsert_keep_latest,
    )

    merged = upsert_keep_latest(existing, normalized_batch, LAP_KEY, "IngestedAt")
    assert_unique_key(merged, LAP_KEY)
    return merged
