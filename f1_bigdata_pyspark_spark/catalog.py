"""Declared schemas + loaders for the synthetic test tables.

The reference infers its schema by connector sampling of a schemaless Mongo
collection (reference: ``src/processing/mongo_avg_laptime_by_driver.py:30``,
SURVEY.md §1.4). This engine declares fixed StructTypes (schema-on-write
parquet) and validates reads against them — the schema-drift tolerance the
reference codes by hand (``if "col" in df.columns``) becomes
``has_column``-style optional handling in the query layer.

Scale notes: ``spark.read.parquet`` gives vectorized scans, predicate pushdown
and column pruning for free; at 100 TB the tables would additionally be laid
out partitioned (e.g. lineitem by ship month) and/or bucketed by join key —
see ``sources/parquet.py`` writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Broadcast decisions are SIZE-based, not name-based: a table that is a
# broadcast dimension at sf0.1 (customer, ~15k rows) is a 15M-row shuffle
# join at sf100. See operators/join_policy.broadcast_if_small — the hint is
# applied iff Catalyst's size estimate is under
# spark.sql.autoBroadcastJoinThreshold.

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


# (session id, sf_dir, name) -> base scan DataFrame. DataFrames are
# immutable, so handing the same object to every caller is safe; memoizing
# skips the per-call file listing + reader setup (~0.1 s per table per
# query construction — material when a bench sweep builds dozens of plans).
_SCAN_CACHE: dict[tuple[int, str, str], DataFrame] = {}


_TS_UNIT_CACHE: dict[str, str] = {}


def _events_ts_unit(sf_dir: str) -> str:
    """Parquet time unit ('us' | 'ns') of events.ts, from the file footer."""
    unit = _TS_UNIT_CACHE.get(sf_dir)
    if unit is None:
        import pyarrow.parquet as pq

        field = pq.read_schema(table_path(sf_dir, "events")).field("ts")
        unit = getattr(field.type, "unit", "us")
        _TS_UNIT_CACHE[sf_dir] = unit
    return unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table with the DECLARED schema (schema-on-write
    discipline, SURVEY.md §1.4): passing the StructType to the reader skips
    footer-based schema inference — measured 4x faster DataFrame creation —
    and pins the types the query layer was written against.

    ``events.ts`` has shipped in two parquet encodings across testdata
    generations: TIMESTAMP(NANOS) — which Spark's vectorized reader rejects —
    and plain TIMESTAMP(MICROS). The footer is sniffed (one cheap local
    metadata read, memoized with the scan) and only the nanos encoding takes
    the legacy path: read raw nanos (LongType + ``nanosAsLong`` conf) and
    convert with exact integer division (micros truncation — the same
    conversion DuckDB applies), keeping oracle comparisons bit-identical.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (id(spark), sf_dir, name)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events" and _events_ts_unit(sf_dir) == "ns":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        read_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in SCHEMAS["events"].fields
            ]
        )
        df = spark.read.schema(read_schema).parquet(table_path(sf_dir, name))
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        df = spark.read.schema(SCHEMAS[name]).parquet(table_path(sf_dir, name))
    _SCAN_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view for the SQL face of the engine."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def has_column(df: DataFrame, name: str) -> bool:
    """Schema-tolerance guard, reproducing the reference's optional-column
    checks (reference: ``fastest_vs_most_consistent_drivers.py:67-85``)."""
    return name in df.columns
