#!/usr/bin/env python
"""Warm-timed end-to-end wall for the named query faces at sf0.01 —
min of N runs each, one shared session (the r11 time_all_queries
methodology, focused). Usage: time_faces.py [repo_root] name...
Passing a different repo_root times that checkout's code (A/B)."""
import sys
import time

root = sys.argv[1] if sys.argv[1:] and "/" in sys.argv[1] else "/root/repo"
names = [a for a in sys.argv[1:] if "/" not in a]
sys.path.insert(0, root)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY

SF = "/root/testdata/sf0.01"
for name in names:
    fn = _REGISTRY[name].fn
    best = None
    for _ in range(3):
        t0 = time.time()
        fn(spark, SF).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:45s} {best:7.2f}s", flush=True)
spark.stop()
