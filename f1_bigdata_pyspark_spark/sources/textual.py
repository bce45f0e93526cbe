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
