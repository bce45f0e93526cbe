#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query -> plans/r11/<q>_<tag>.txt.

Usage: python scripts_r11/capture_plans.py <tag> [query ...]
Runs on the same tuned session bench.py uses, at sf0.1.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY
from f1_bigdata_pyspark_spark.session import env_sf_dir, get_spark

sf_dir = env_sf_dir()
spark = get_spark(app_name="plan-capture")
out_dir = os.path.join("/root/repo/plans/r11")
os.makedirs(out_dir, exist_ok=True)

for q in _REGISTRY.values():
    if not q.bench or (only and q.name not in only):
        continue
    df = q.fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{q.name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(f"WROTE {path} ({len(buf.getvalue())} bytes)", flush=True)
spark.stop()
