#!/usr/bin/env python
"""Time every registered query end-to-end (build + collect) at sf0.01 on the
tuned session — the triage pass that finds the slowest non-bench operator
paths. One pass (correctness is the driver-sim's job; this is for ranking)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY
from f1_bigdata_pyspark_spark.session import get_spark
from f1_bigdata_pyspark_spark.catalog import TABLES, load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="time-all")
for t in TABLES:
    load_table(spark, sf_dir, t).count()

times = {}
for name, q in _REGISTRY.items():
    t0 = time.perf_counter()
    try:
        q.fn(spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 3)
    except Exception as ex:
        times[name] = f"ERR {ex!r}"[:120]
    print(f"{times[name]}\t{name}", flush=True)
with open("/tmp/query_times.json", "w") as fh:
    json.dump(times, fh)
spark.stop()
