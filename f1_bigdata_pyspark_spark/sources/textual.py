"""CSV / JSON(lines) source and sink faces.

The reference's only sources are the FastF1 API and MongoDB (SURVEY.md
§2.1); file interchange enters because a standalone engine needs lossless
import/export paths. Both formats are schema-on-write here: readers take the
declared StructType (never inferSchema — a 100 TB inference pass reads the
data twice) and writers pin the timestamp format so round-trips are exact.

Scale notes: both formats split by file; compression is per-file codec
(gzip JSON is *not* splittable — use none/zstd for big exports). Parquet
remains the canonical store; these are interchange edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# microsecond-precision, timezone-stable round-trip format
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_CSV_OPTS = {
    "header": "true",
    "timestampFormat": _TS_FMT,
    "nullValue": "\\N",  # distinguish NULL from empty string
    "emptyValue": '""',
}
_JSON_OPTS = {"timestampFormat": _TS_FMT, "ignoreNullFields": "false"}


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).options(**_CSV_OPTS).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.options(**_CSV_OPTS).schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).options(**_JSON_OPTS).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.options(**_JSON_OPTS).schema(schema).json(path)


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSON-lines read with corrupt-record QUARANTINE: returns
    (good, bad) where ``bad`` carries the raw un-parseable line. A 100 TB
    web-scrape ingest always contains malformed rows; FAILFAST kills the
    whole job on row one billion, and silent DROPMALFORMED destroys the
    evidence — the quarantine split is the production contract (parse what
    parses, keep the rest re-processable). One scan plans both frames; the
    corrupt column is populated by the parser itself, no second pass.

    Caveat baked into the split: Spark leaves every OTHER field NULL on a
    corrupt row, so `good` filters on the corrupt column being NULL rather
    than any data field."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    # build a FRESH StructType: StructType.add mutates in place (verified
    # on this build), so schema.add(...) would permanently append
    # _corrupt_record to the CALLER's schema object — a second call would
    # then add a duplicate field and plain read_jsonl calls with the same
    # object would expect the phantom column
    with_corrupt = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    raw = (
        spark.read.options(**_JSON_OPTS)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(with_corrupt)
        .json(path)
    )
    # Spark refuses plans that reference ONLY the corrupt column over a raw
    # file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parsed result must
    # be pinned first; localCheckpoint also means the file parses ONCE for
    # both output frames.
    from f1_bigdata_pyspark_spark.utils import materialize

    raw = materialize(raw)
    good = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad
