#!/usr/bin/env python
"""Focused oracle check: verify the named queries vs DuckDB at sf0.01."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
from tests.oracle_harness import duckdb_connection, run_oracle, run_spark, compare

con = duckdb_connection("/root/testdata/sf0.01")
oracles = E.oracle_sql()
qs = E.queries()
bad = []
for name in sys.argv[1:]:
    t0 = time.time()
    try:
        sres = run_spark(qs[name], spark, "/root/testdata/sf0.01")
        diff = compare(name, sres, run_oracle(con, oracles[name]))
        dt = time.time() - t0
        if diff:
            bad.append(name); print(f"FAIL {name}: {diff} ({dt:.1f}s)", flush=True)
        else:
            print(f"OK {name} ({dt:.1f}s)", flush=True)
    except Exception as ex:
        bad.append(name); print(f"ERROR {name}: {repr(ex)[:300]}", flush=True)
spark.stop()
sys.exit(1 if bad else 0)
