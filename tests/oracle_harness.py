"""Local replica of the driver's correctness gate: run a declared Spark query
and its DuckDB oracle on the same parquet tables, compare row count, schema
width, and order-insensitive values.

Comparison is strict: rows are canonicalized (column order by name, row order
by the full tuple) and compared for exact equality — matching what a value
hash would see. Floats must therefore already be rounded inside BOTH queries;
a failure here means the driver's hash would also mismatch.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from f1_bigdata_pyspark_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon_value(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize -0.0 and integral floats
        if v == 0:
            return 0.0
        return v
    return v


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def run_spark(query_fn, spark, sf_dir: str) -> tuple[list[str], list[tuple]]:
    df = query_fn(spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def run_oracle(con, sql: str) -> tuple[list[str], list[tuple]]:
    rel = con.sql(sql)
    return list(rel.columns), [tuple(r) for r in rel.fetchall()]


def compare(name: str, spark_res, oracle_res) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    scols, srows = spark_res
    ocols, orows = oracle_res
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        errs.append(f"{name}: schema mismatch spark={sorted(scols)} oracle={sorted(ocols)}")
        return errs
    if len(srows) != len(orows):
        errs.append(f"{name}: row count spark={len(srows)} oracle={len(orows)}")
    sc = _canon_rows([c.lower() for c in scols], srows)
    oc = _canon_rows([c.lower() for c in ocols], orows)
    if sc != oc:
        diffs = [
            (a, b) for a, b in zip(sc, oc) if a != b
        ][:5]
        only_s = [r for r in sc if r not in set(map(tuple, oc))][:3]
        only_o = [r for r in oc if r not in set(map(tuple, sc))][:3]
        errs.append(
            f"{name}: value mismatch; first diffs={diffs!r} "
            f"spark-only={only_s!r} oracle-only={only_o!r}"
        )
    return errs
