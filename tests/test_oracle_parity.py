"""Every declared query with an oracle must match DuckDB exactly at sf0.01 —
the same comparison (and the same scale factor) the driver's correctness gate
uses."""

from __future__ import annotations

import pytest

from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY
from tests.oracle_harness import compare, duckdb_connection, run_oracle, run_spark

ORACLE_QUERIES = [q.name for q in _REGISTRY.values() if q.oracle is not None]
ROWS_ONLY_QUERIES = [q.name for q in _REGISTRY.values() if q.oracle is None]


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb_connection(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name, spark, sf_oracle, con):
    q = _REGISTRY[name]
    spark_res = run_spark(q.fn, spark, sf_oracle)
    oracle_res = run_oracle(con, q.oracle)
    assert len(spark_res[1]) > 0, f"{name}: empty result — not a meaningful check"
    errs = compare(name, spark_res, oracle_res)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark, sf_oracle):
    q = _REGISTRY[name]
    df = q.fn(spark, sf_oracle)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
