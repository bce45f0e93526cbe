"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementation lives in ``f1_bigdata_pyspark_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from f1_bigdata_pyspark_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (filter → groupBy → agg → orderBy, the reference's
    mongo_avg_laptime_by_driver shape) on /root/testdata/sf0.001."""
    from f1_bigdata_pyspark_spark.queries.parity import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twins — one per declared query, no exceptions.
    Hash-derived ops (MinHash/SimHash/LSH/IVF) use portable md5/sin-based
    math; engine-specific sketches (DataSketches HLL, percentile_approx)
    declare exact values plus within-tolerance booleans, so even the
    approximate paths sit under the driver's value-hash gate."""
    return all_oracles()
