"""CSV/JSON interchange round-trips: schema-on-write out, declared-schema
read back, value-exact equality including NULLs, timestamps (micros) and
doubles."""

from __future__ import annotations

import shutil
import tempfile

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.sources.textual import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)


def _roundtrip(spark, df, writer, reader):
    out = tempfile.mkdtemp(prefix="src_face_")
    try:
        writer(df, out)
        back = reader(spark, out, df.schema)
        assert back.schema == df.schema
        a = {tuple(r) for r in df.collect()}
        b = {tuple(r) for r in back.collect()}
        assert a == b
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_csv_roundtrip_orders(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "orders")
    _roundtrip(spark, df, write_csv, read_csv)


def test_jsonl_roundtrip_events(spark, sf_smoke):
    # events: micro-precision timestamps, doubles, JSON-in-string props
    df = load_table(spark, sf_smoke, "events")
    _roundtrip(spark, df, write_jsonl, read_jsonl)


def test_jsonl_roundtrip_documents_nulls(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "documents")
    _roundtrip(spark, df, write_jsonl, read_jsonl)


def test_compact_table_reduces_files(spark, sf_smoke, tmp_path):
    from f1_bigdata_pyspark_spark.sources.parquet import compact_table

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    events = load_table(spark, sf_smoke, "events")
    # fragment: one file per partition of a 64-way split (~tiny files)
    events.repartition(64).write.mode("overwrite").parquet(src)
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 64
    n_written = compact_table(spark, src, dst, target_file_bytes=64 * 1024 * 1024)
    out_files = glob.glob(f"{dst}/*.parquet")
    # sf0.001 events are far below one 64 MB target file
    assert len(out_files) == 1
    # the return value is the actual file count, not scan-partition count
    assert n_written == len(out_files)
    got = spark.read.parquet(dst)
    assert got.count() == events.count()
    assert set(got.columns) == set(events.columns)


def test_schema_evolution_merge_read(spark, sf_smoke, tmp_path):
    """Schema-drift tolerance at the storage layer — the reference's
    'extendable with no schema changes' claim (SURVEY.md §1.4) expressed
    as parquet schema evolution: a later batch adds a column; a
    mergeSchema read unifies both generations, with NULLs for the old
    batch's missing column, and the query layer's has_column guard sees
    the merged schema."""
    from f1_bigdata_pyspark_spark.catalog import has_column

    base = str(tmp_path / "evolving")
    events = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "value"
    )
    events.filter("event_id % 2 = 0").write.parquet(f"{base}/gen=1")
    from pyspark.sql import functions as F

    events.filter("event_id % 2 = 1").withColumn(
        "quality_score", F.round(F.col("value") / 100.0, 6)
    ).write.parquet(f"{base}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert has_column(merged, "quality_score")
    assert merged.count() == events.count()
    old_gen = merged.filter("gen = 1")
    assert old_gen.filter(F.col("quality_score").isNotNull()).count() == 0
    new_gen = merged.filter("gen = 2")
    assert new_gen.filter(F.col("quality_score").isNull()).count() == 0


def test_observation_metrics_piggyback_on_query(spark, sf_smoke):
    """The Observation API: data-quality counters (row count, null count,
    value sum) collected DURING a query's single pass — no second scan.
    The production shape for per-job quality telemetry at 100 TB, where a
    separate audit query would double the read."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.catalog import load_table

    events = load_table(spark, sf_smoke, "events")
    obs = Observation("quality")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    result = observed.groupBy("event_type").count().collect()
    metrics = obs.get
    assert metrics["n_rows"] == events.count()
    assert metrics["n_null_value"] == events.filter(
        F.col("value").isNull()
    ).count()
    expected_sum = events.agg(F.round(F.sum("value"), 2)).collect()[0][0]
    assert metrics["sum_value"] == expected_sum
    assert sum(r["count"] for r in result) == metrics["n_rows"]


def test_dynamic_partition_overwrite_backfill(spark, sf_smoke, tmp_path):
    """Backfill semantics: restating ONE day replaces only that day's
    partition; other days' files (and rows) are byte-identical survivors —
    neither truncated (static overwrite) nor duplicated (append)."""
    import glob

    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.catalog import load_table
    from f1_bigdata_pyspark_spark.sources.parquet import (
        overwrite_partitions_dynamic,
        write_table,
    )

    events = load_table(spark, sf_smoke, "events").withColumn(
        "day", F.to_date("ts")
    )
    target = str(tmp_path / "events_by_day")
    write_table(events, target, partition_cols=["day"])

    days = sorted(
        r["day"] for r in events.select("day").distinct().collect()
    )
    assert len(days) >= 2
    restate_day, keep_day = days[0], days[1]
    before_keep_files = sorted(glob.glob(f"{target}/day={keep_day}/*.parquet"))

    restated = events.filter(F.col("day") == restate_day).withColumn(
        "value", F.col("value") * 2
    )
    overwrite_partitions_dynamic(restated, target, ["day"])

    after = spark.read.parquet(target)
    # untouched day: same files on disk, same rows
    assert (
        sorted(glob.glob(f"{target}/day={keep_day}/*.parquet"))
        == before_keep_files
    )
    assert (
        after.filter(F.col("day") == keep_day).count()
        == events.filter(F.col("day") == keep_day).count()
    )
    # restated day: replaced, not appended
    orig = events.filter(F.col("day") == restate_day)
    got = after.filter(F.col("day") == restate_day)
    assert got.count() == orig.count()
    assert (
        got.agg(F.round(F.sum("value"), 2)).collect()[0][0]
        == orig.agg(F.round(F.sum("value") * 2, 2)).collect()[0][0]
    )
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"
    )


def test_analyze_table_feeds_optimizer_stats(spark, sf_smoke, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS: catalog row counts and per-column
    NDV/min/max flow into Catalyst's optimized-plan stats — the input the
    cost-based optimizer (and our size-aware join policy) plans from. At
    100 TB these stats are what turn a blind SortMergeJoin into a
    broadcast or a better join order; this pins that the plumbing works
    end to end on a real table."""
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.catalog import load_table

    prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        events = load_table(spark, sf_smoke, "events")
        n = events.count()
        (
            events.select("event_id", "event_type", "user_id")
            .write.mode("overwrite")
            .option("path", str(tmp_path / "t_events"))
            .saveAsTable("t_events_stats")
        )
        spark.sql(
            "ANALYZE TABLE t_events_stats COMPUTE STATISTICS "
            "FOR COLUMNS event_type, user_id"
        )
        stats = (
            spark.table("t_events_stats")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert stats.rowCount().get() == n

        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE EXTENDED t_events_stats event_type"
            ).collect()
        }
        expected_ndv = (
            events.select("event_type").distinct().count()
        )
        assert int(desc["distinct_count"]) == expected_ndv
        assert int(desc["num_nulls"]) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_events_stats")
        spark.conf.set("spark.sql.cbo.enabled", prev)


def test_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    """Malformed lines land in the quarantine frame with their raw text;
    parseable lines come out typed; nothing is silently dropped."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from f1_bigdata_pyspark_spark.sources.textual import read_jsonl_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"k": 1, "name": "a"}\n'
        "this is not json\n"
        '{"k": 2, "name": "b"}\n'
        '{"k": "not-a-number", "name": "c"}\n'
    )
    schema = StructType(
        [StructField("k", LongType()), StructField("name", StringType())]
    )
    good, bad = read_jsonl_quarantine(spark, str(p), schema)
    assert sorted((r.k, r.name) for r in good.collect()) == [(1, "a"), (2, "b")]
    bad_rows = [r.raw_line for r in bad.collect()]
    assert len(bad_rows) == 2
    assert "this is not json" in bad_rows[0] or "this is not json" in bad_rows[1]
    # conservation: every input line is either good or quarantined
    assert good.count() + bad.count() == 4
