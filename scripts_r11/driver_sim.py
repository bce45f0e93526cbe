#!/usr/bin/env python
"""Driver-identical correctness run: entry() smoke + every declared query
vs its DuckDB oracle at sf0.01. Mirrors the external driver's methodology."""
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

rows = E.entry(spark).collect()
assert len(rows) > 0, "entry smoke failed"
print(f"ENTRY_OK rows={len(rows)}", flush=True)

from tests.oracle_harness import duckdb_connection, run_oracle, run_spark, compare

con = duckdb_connection("/root/testdata/sf0.01")
oracles = E.oracle_sql()
names = list(E.queries().items())
t0 = time.time()
bad = []
for i, (name, fn) in enumerate(names):
    try:
        sres = run_spark(fn, spark, "/root/testdata/sf0.01")
        if name in oracles:
            diff = compare(name, sres, run_oracle(con, oracles[name]))
            if diff:
                bad.append((name, diff))
                print(f"FAIL {name}: {diff}", flush=True)
        else:
            bad.append((name, "NO ORACLE"))
            print(f"NO_ORACLE {name}", flush=True)
    except Exception as ex:
        bad.append((name, repr(ex)[:300]))
        print(f"ERROR {name}: {repr(ex)[:300]}", flush=True)
    if (i + 1) % 50 == 0:
        print(f"... {i+1}/{len(names)} in {time.time()-t0:.0f}s", flush=True)
print(f"DONE {len(names)} queries in {time.time()-t0:.0f}s, {len(bad)} bad", flush=True)
for name, d in bad:
    print("BAD:", name, d, flush=True)
spark.stop()
sys.exit(1 if bad else 0)
