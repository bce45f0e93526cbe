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
    compact_table(spark, src, dst, target_file_bytes=64 * 1024 * 1024)
    out_files = glob.glob(f"{dst}/*.parquet")
    # sf0.001 events are far below one 64 MB target file
    assert len(out_files) == 1
    got = spark.read.parquet(dst)
    assert got.count() == events.count()
    assert set(got.columns) == set(events.columns)
